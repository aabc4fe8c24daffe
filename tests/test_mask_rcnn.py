"""Mask R-CNN specifics: mask targets, mask loss wiring, paste, eval."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectron_tpu.config import get_config
from detectron_tpu.layers.mask_target import crop_gt_masks_to_rois
from detectron_tpu.models import mask_rcnn as mrcnn
from detectron_tpu.models.zoo import build_detector


@pytest.fixture(scope="module")
def cfg():
    c = get_config()
    c.model.name = "mask_rcnn"
    c.model.num_classes = 5
    c.model.fpn_channels = 32
    c.rpn.pre_nms_topk_train = 64
    c.rpn.post_nms_topk_train = 32
    c.rpn.pre_nms_topk_test = 64
    c.rpn.post_nms_topk_test = 16
    c.roi.batch_per_image = 16
    c.test.detections_per_image = 8
    c.data.image_size = (128, 128)
    return c


def test_crop_gt_masks_identity_roi():
    """RoI == gt box -> target is the (binarized, resampled) gt mask."""
    m0 = 28
    # left half on, right half off
    gt_mask = jnp.zeros((1, m0, m0)).at[:, :, : m0 // 2].set(1.0)
    gt_box = jnp.asarray([[10.0, 10.0, 66.0, 66.0]])
    roi = gt_box
    out = crop_gt_masks_to_rois(gt_mask, gt_box, roi, jnp.array([0]), resolution=28)
    np.testing.assert_allclose(np.asarray(out[0, :, :14]), 1.0)
    np.testing.assert_allclose(np.asarray(out[0, :, 14:]), 0.0)


def test_crop_gt_masks_shifted_roi():
    """RoI covering right half of gt box sees only the off region."""
    m0 = 28
    gt_mask = jnp.zeros((1, m0, m0)).at[:, :, : m0 // 2].set(1.0)
    gt_box = jnp.asarray([[0.0, 0.0, 56.0, 56.0]])
    roi = jnp.asarray([[28.0, 0.0, 56.0, 56.0]])  # right half
    out = crop_gt_masks_to_rois(gt_mask, gt_box, roi, jnp.array([0]), resolution=28)
    assert float(out.sum()) == 0.0
    # left-half RoI sees all ones
    roi2 = jnp.asarray([[0.0, 0.0, 28.0, 56.0]])
    out2 = crop_gt_masks_to_rois(gt_mask, gt_box, roi2, jnp.array([0]), resolution=28)
    np.testing.assert_allclose(np.asarray(out2[0]), 1.0)


def test_mask_rcnn_train_and_eval(cfg):
    det = build_detector(cfg)
    params = det.init(jax.random.key(0), (128, 128))
    gt_boxes = jnp.zeros((1, 8, 4)).at[0, 0].set(jnp.array([20.0, 20.0, 90.0, 90.0]))
    gt_classes = jnp.zeros((1, 8), jnp.int32).at[0, 0].set(3)
    gt_masks = jnp.ones((1, 8, 28, 28))
    batch = {
        "image": jnp.ones((1, 128, 128, 3)),
        "image_hw": jnp.array([[128.0, 128.0]]),
        "gt_boxes": gt_boxes,
        "gt_classes": gt_classes,
        "gt_masks": gt_masks,
    }
    total, ld = det.loss_fn(params, batch, jax.random.key(1))
    assert "loss_mask" in ld
    for k, v in ld.items():
        assert np.isfinite(float(v)), k
    # mask loss at init ~ -log(sigmoid(0)) = 0.693 for all-ones targets
    assert 0.2 < float(ld["loss_mask"]) < 2.0

    dets, masks = det.predict_fn(params, batch)
    assert masks is not None
    assert masks.shape == (1, cfg.test.detections_per_image, 28, 28)
    assert bool(jnp.all((masks >= 0) & (masks <= 1)))


def test_paste_masks_numpy_and_device_agree():
    rng = np.random.RandomState(0)
    masks = rng.uniform(0, 1, (3, 28, 28)).astype(np.float32)
    boxes = np.array(
        [[10.0, 10.0, 50.0, 40.0], [0.0, 0.0, 64.0, 64.0], [30.0, 30.0, 31.5, 33.0]],
        np.float32,
    )
    valid = np.array([True, True, False])
    host = mrcnn.paste_masks_numpy(masks, boxes, valid, (64, 64))
    dev = np.asarray(
        mrcnn.paste_masks_device(
            jnp.asarray(masks), jnp.asarray(boxes), jnp.asarray(valid), (64, 64)
        )
    ).astype(np.uint8)
    assert host.shape == dev.shape == (3, 64, 64)
    assert host[2].sum() == 0 and dev[2].sum() == 0
    # interiors agree except at box-edge rounding; allow small disagreement
    disagree = (host != dev).mean()
    assert disagree < 0.02, disagree


def test_paste_mask_full_box_coverage():
    masks = np.ones((1, 28, 28), np.float32)
    boxes = np.array([[8.0, 8.0, 24.0, 24.0]], np.float32)
    out = mrcnn.paste_masks_numpy(masks, boxes, np.array([True]), (32, 32))
    assert out[0, 10, 10] == 1 and out[0, 4, 4] == 0
    assert out[0].sum() == 16 * 16
