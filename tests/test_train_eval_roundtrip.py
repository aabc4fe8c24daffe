"""Fixture train->eval roundtrip through the REAL data pipeline.

The one end-to-end chain no other test exercises (round-2 verdict, top
item): every overfit test feeds `synthetic.make_batch` tensors straight
into the step, bypassing `CocoDataset` -> polygon->box-frame mask
rasterization -> flip/scale-jitter -> `Loader` -> the `train.py` driver
entirely. Here Mask R-CNN trains on the committed COCO fixture THROUGH
`train.py` (hflip on, scale jitter on), checkpoints via orbax, and
`eval.py` restores the checkpoint and must recover box AP50 >= 0.9 AND
segm AP50 >= 0.9 — the closest thing to real-data mAP parity this
container permits (reference: train.py + test.py full stacks, SURVEY.md
§3.1/§3.2/§4). A mask-mirroring, polygon-raster, or jitter/coordinate
convention bug in the training data path fails this test and nothing else.
"""

import json
import os
import sys

import pytest

from tests.fixture_coco import make_fixture

# 96x96 canvas: ~1.7x faster CPU steps than 128² buys 800 steps in the
# same wall-clock (500 steps at 128² plateaued at AP50 0.88: the two
# largest fixture boxes stayed low-confidence under flip+jitter).
# Eval uses the standard COCO 0.05 score threshold (0.3 measured -0.05
# AP50 on a memorized set purely through lost recall).
COMMON_CFG = [
    "data.dataset=coco",
    "data.train_split=val", "data.val_split=val",
    "data.short_side=80", "data.max_size=96",
    "data.image_size=[96,96]",
    "model.name=mask_rcnn", "model.num_classes=4",
    "model.fpn_channels=32", "model.frozen_stages=0",
    "train.batch_size=2", "train.max_gt_boxes=8",
    "parallel.num_devices=1",
    "rpn.pre_nms_topk_train=128", "rpn.post_nms_topk_train=64",
    "rpn.pre_nms_topk_test=128", "rpn.post_nms_topk_test=32",
    "roi.batch_per_image=32",
    "test.detections_per_image=20", "test.score_thresh=0.05",
]


@pytest.mark.slow
def test_coco_fixture_train_eval_roundtrip(monkeypatch, tmp_path):
    import eval as eval_driver
    import train as train_driver

    root = make_fixture(str(tmp_path / "coco"))
    out = str(tmp_path / "out")

    train_argv = ["train.py", "--cfg", f"data.root={root}", *COMMON_CFG,
                  # the real augmentation path: hflip (default 0.5) AND
                  # scale jitter, so box-frame masks must mirror/rescale
                  # consistently with boxes through the whole chain
                  "data.train_scales=[64,80,96]",
                  "train.max_steps=800", "train.base_lr=0.01",
                  "train.grad_clip_norm=1.0",
                  "train.warmup_steps=20", "train.warmup_factor=0.1",
                  # two-stage decay so the tail settles the heads hard on
                  # the augmented 6-image set (flat 0.01 plateaued ~1.0)
                  "train.lr_decay_steps=[500,700]",
                  "train.log_every=100", "train.checkpoint_every=800",
                  f"output_dir={out}"]
    monkeypatch.setattr(sys, "argv", train_argv)
    train_driver.main()

    eval_argv = ["eval.py", "--cfg", f"data.root={root}", *COMMON_CFG,
                 f"output_dir={out}"]
    monkeypatch.setattr(sys, "argv", eval_argv)
    eval_driver.main()

    with open(os.path.join(out, "eval_results.json")) as f:
        res = json.load(f)
    assert res["AP50"] >= 0.9, res
    assert res["segm_AP50"] >= 0.9, res
