"""Config-knob wiring matrix: every impl/algorithm knob builds, runs a
predict step, and (for the train-relevant ones) a loss step on tiny shapes.

Guards the cfg -> module plumbing (align_impl, pool_type, stem, nms_algo,
roi.window, norm) — a knob that silently stops reaching its op would
otherwise only be caught on hardware benches.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectron_tpu.config import cfg_from_list, get_config
from detectron_tpu.data.synthetic import make_batch
from detectron_tpu.models.zoo import build_detector


def _tiny_cfg(model="mask_rcnn", overrides=()):
    cfg = get_config()
    cfg.model.name = model
    cfg.model.num_classes = 4
    cfg.model.fpn_channels = 32
    cfg.model.frozen_stages = 0
    cfg.data.image_size = (128, 128)
    cfg.train.batch_size = 1
    cfg.train.max_gt_boxes = 4
    cfg.rpn.pre_nms_topk_test = 64
    cfg.rpn.post_nms_topk_test = 16
    cfg.rpn.pre_nms_topk_train = 64
    cfg.rpn.post_nms_topk_train = 32
    cfg.roi.batch_per_image = 16
    cfg.test.detections_per_image = 5
    if overrides:
        cfg_from_list(list(overrides), cfg)
    return cfg


@pytest.mark.parametrize("overrides", [
    ("roi.align_impl=gather",),
    ("roi.align_impl=window",),
    ("roi.align_impl=window", "roi.window=24"),
    ("roi.align_impl=window", "roi.bwd_order=xla"),
    ("roi.pool_type=pool",),
    ("model.stem=s2d",),
    ("model.remat=True",),
    ("model.norm=gn",),
    ("model.nms_algo=fixpoint",),
    ("model.nms_algo=loop",),
])
def test_predict_and_loss_run(overrides):
    cfg = _tiny_cfg(overrides=overrides)
    det = build_detector(cfg)
    params = det.init(jax.random.key(0), (128, 128))
    batch = jax.tree.map(
        jnp.asarray,
        make_batch(np.random.RandomState(0), 1, (128, 128),
                   cfg.model.num_classes),
    )
    pbatch = {k: v for k, v in batch.items()
              if k not in ("gt_boxes", "gt_classes", "gt_masks")}
    dets, masks = jax.jit(lambda p, b: det.predict_fn(p, b))(params, pbatch)
    assert np.isfinite(np.asarray(dets.scores)).all()
    total, parts = jax.jit(
        lambda p, b: det.loss_fn(p, b, jax.random.key(1))
    )(params, batch)
    assert np.isfinite(float(total))
