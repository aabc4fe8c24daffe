"""Visualization + metrics writer smoke tests."""

import json
import os

import numpy as np

from detectron_tpu.utils.metrics import MetricsWriter
from detectron_tpu.utils.visualize import draw_detections


def test_draw_detections_with_masks():
    img = np.zeros((64, 64, 3), np.uint8)
    boxes = np.array([[10, 10, 40, 40], [50, 50, 60, 60]], np.float32)
    scores = np.array([0.9, 0.2])
    classes = np.array([1, 2])
    masks = np.zeros((2, 64, 64), bool)
    masks[0, 15:35, 15:35] = True
    out = draw_detections(img, boxes, scores, classes, masks=masks,
                          score_threshold=0.5)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert out[20, 20].sum() > 0  # mask tint applied
    assert out[55, 55].sum() == 0  # low-score det skipped
    assert (out != img).any()


def test_draw_respects_valid_mask():
    img = np.zeros((32, 32, 3), np.uint8)
    out = draw_detections(
        img, np.array([[5, 5, 20, 20]], np.float32), np.array([0.9]),
        np.array([1]), valid=np.array([False]),
    )
    assert (out == img).all()


def test_metrics_writer(tmp_path):
    w = MetricsWriter(str(tmp_path), use_tensorboard=False)
    w.write(1, {"loss": 2.0})
    w.write(2, {"loss": 1.0, "lr": 0.01})
    w.close()
    lines = [json.loads(x) for x in
             open(os.path.join(tmp_path, "metrics.jsonl"))]
    assert lines[0]["loss"] == 2.0 and lines[1]["step"] == 2
