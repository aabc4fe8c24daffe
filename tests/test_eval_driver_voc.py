"""End-to-end eval.py driver tests on a committed VOC-layout fixture.

Driver-level coverage of the VOC dispatch (reference: test.py +
libs/datasets/pascal_voc lineage): loader -> (predict) -> coordinate
unmapping -> difficult-aware VOC AP -> results JSON. The COCO analog lives
in tests/test_eval_driver.py.
"""

import json
import os
import sys

import numpy as np
import pytest

from tests.fixture_voc import make_fixture


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    return make_fixture(str(tmp_path_factory.mktemp("voc_fixture")))


def _run_eval(monkeypatch, fixture_root, tmp_path, extra=()):
    import eval as eval_driver

    out_dir = str(tmp_path / "out")
    argv = [
        "eval.py", "--no-restore", "--cfg",
        f"data.root={fixture_root}",
        "data.dataset=voc", "data.val_split=test",
        "data.short_side=96", "data.max_size=128",
        "data.image_size=[128,128]",
        "model.name=faster_rcnn", "model.num_classes=21",
        "model.fpn_channels=32", "model.frozen_stages=0",
        "train.batch_size=2", "train.max_gt_boxes=8",
        "parallel.num_devices=2",
        "rpn.pre_nms_topk_test=128", "rpn.post_nms_topk_test=32",
        "test.detections_per_image=10",
        f"output_dir={out_dir}",
    ] + list(extra)
    monkeypatch.setattr(sys, "argv", argv)
    eval_driver.main()
    with open(os.path.join(out_dir, "eval_results.json")) as f:
        return json.load(f)


def test_voc_driver_oracle_predictor_exact_map(monkeypatch, fixture_root,
                                               tmp_path):
    """gt-echo predictor through the full driver: VOC mAP must be 1.0 —
    including on images whose first object is `difficult` (echoed difficult
    boxes match difficult gt and are IGNORED, not false positives)."""
    import detectron_tpu.parallel as parallel
    from detectron_tpu.models.retinanet import Detections

    def fake_make_predict_step(det, mesh, axis="data"):
        def predict(params, batch):
            gt_boxes = np.asarray(batch["gt_boxes"], np.float32)
            gt_classes = np.asarray(batch["gt_classes"], np.int32)
            valid = gt_classes > 0
            scores = np.where(valid, 0.9, 0.0).astype(np.float32)
            return Detections(boxes=gt_boxes, scores=scores,
                              classes=gt_classes, valid=valid), None

        return predict

    monkeypatch.setattr(parallel, "make_predict_step", fake_make_predict_step)
    res = _run_eval(monkeypatch, fixture_root, tmp_path)
    assert res["mAP"] == pytest.approx(1.0, abs=1e-6), res


def test_voc_driver_real_predict_smoke(monkeypatch, fixture_root, tmp_path):
    """The real jitted predict path on the VOC fixture (random weights):
    runs all images, emits finite VOC metrics."""
    res = _run_eval(monkeypatch, fixture_root, tmp_path)
    assert "mAP" in res
    assert res["mAP"] is None or 0.0 <= res["mAP"] <= 1.0
