"""Zoo config files parse, merge, and build detectors (config drift guard)."""

import glob
import os

import pytest

from detectron_tpu.config import cfg_from_list, get_config
from detectron_tpu.models.zoo import build_detector

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs")
CONFIGS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml")))


def test_zoo_has_expected_configs():
    names = {os.path.basename(p) for p in CONFIGS}
    # the five BASELINE.json zoo entries + VOC variant
    assert {
        "faster_rcnn_r50_coco_single.yaml",
        "retinanet_r50_fpn_coco.yaml",
        "faster_rcnn_r50_fpn_coco.yaml",
        "mask_rcnn_r50_fpn_coco.yaml",
        "mask_rcnn_r101_fpn_coco_train.yaml",
        "retinanet_r50_fpn_voc.yaml",
    } <= names


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_parses_and_builds(path):
    cfg = get_config(path)
    det = build_detector(cfg)
    assert det.module is not None
    assert cfg.model.num_classes >= 2
    # canvas must halve cleanly down the pyramid (C2..C5 => % 32);
    # deeper levels use ceil-striding consistently with the anchor grids
    h, w = cfg.data.image_size
    assert h % 32 == 0 and w % 32 == 0, "canvas must divide stride 32"


def test_cli_override_layering():
    cfg = get_config(
        os.path.join(CONFIG_DIR, "mask_rcnn_r50_fpn_coco.yaml"),
        overrides=["model.backbone=resnet101", "train.base_lr=0.04"],
    )
    assert cfg.model.backbone == "resnet101"
    assert cfg.train.base_lr == 0.04
    assert cfg.model.name == "mask_rcnn"  # from YAML


def test_cli_override_yaml11_bool_words_stay_strings():
    """YAML 1.1 parses on/off/yes/no as bools; string-typed knobs like
    model.fused_roi_align=on must receive the literal text (this broke
    every fused-flag CLI A/B with a TypeError)."""
    cfg = get_config(overrides=["model.fused_roi_align=on",
                                "model.fused_nms=off"])
    assert cfg.model.fused_roi_align == "on"
    assert cfg.model.fused_nms == "off"


def test_unknown_yaml_key_rejected(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("model:\n  nonexistent_key: 1\n")
    with pytest.raises(KeyError):
        get_config(str(bad))
