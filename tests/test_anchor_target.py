"""Static-shape anchor target assignment tests."""

import jax
import jax.numpy as jnp
import numpy as np

from detectron_tpu.layers.anchor_target import anchor_target, anchor_target_single
from detectron_tpu.ops.anchors import AnchorGenerator


def make_anchors():
    gen = AnchorGenerator(strides=(16,), ratios=(1.0,), base_scale=4.0)
    return jnp.asarray(gen.all_anchors((128, 128)))  # 8x8 grid of 64x64 anchors


def test_basic_assignment_and_force_match():
    anchors = make_anchors()
    gt = jnp.zeros((4, 4)).at[0].set(jnp.array([30.0, 30.0, 96.0, 96.0]))
    cls = jnp.array([3, 0, 0, 0])  # one gt of class 3, rest padding
    out = anchor_target_single(
        anchors, gt, cls, jax.random.key(0), pos_iou=0.5, neg_iou=0.4,
    )
    assert int(out.num_pos) >= 1
    # every positive points at gt 0 and gets its class
    pos = np.asarray(out.box_weights) > 0
    assert np.all(np.asarray(out.matched_idx)[pos] == 0)
    assert np.all(np.asarray(out.labels)[pos] == 3)
    # padding gts never matched as positive
    assert np.all(np.asarray(out.matched_idx)[pos] < 1)


def test_force_match_rescues_low_iou_gt():
    anchors = make_anchors()
    # tiny gt: IoU with every 64x64 anchor is << 0.5, but its best anchor
    # must still become positive
    gt = jnp.zeros((2, 4)).at[0].set(jnp.array([40.0, 40.0, 50.0, 50.0]))
    cls = jnp.array([1, 0])
    out = anchor_target_single(
        anchors, gt, cls, jax.random.key(0), pos_iou=0.5, neg_iou=0.4,
    )
    assert int(out.num_pos) >= 1
    assert np.all(np.asarray(out.labels)[np.asarray(out.box_weights) > 0] == 1)


def test_no_gt_all_negative():
    anchors = make_anchors()
    gt = jnp.zeros((3, 4))
    cls = jnp.zeros((3,), jnp.int32)
    out = anchor_target_single(
        anchors, gt, cls, jax.random.key(0), pos_iou=0.5, neg_iou=0.4,
    )
    assert int(out.num_pos) == 0
    assert np.all(np.asarray(out.labels) == 0)  # everything negative
    assert np.all(np.asarray(out.cls_weights) == 1.0)


def test_rpn_subsampling_caps():
    anchors = make_anchors()
    gt = jnp.zeros((2, 4)).at[0].set(jnp.array([0.0, 0.0, 128.0, 128.0]))
    cls = jnp.array([1, 0])
    out = anchor_target_single(
        anchors, gt, cls, jax.random.key(1), pos_iou=0.3, neg_iou=0.2,
        sample_size=16, pos_fraction=0.5,
    )
    n_sel = int(np.asarray(out.cls_weights).sum())
    n_pos_sel = int(np.asarray(out.box_weights).sum())
    assert n_sel <= 16
    assert n_pos_sel <= 8
    # selected negatives fill the remainder
    assert n_sel == 16


def test_ignore_band():
    anchors = make_anchors()
    gt = jnp.zeros((1, 4)).at[0].set(jnp.array([30.0, 30.0, 96.0, 96.0]))
    cls = jnp.array([1])
    out = anchor_target_single(
        anchors, gt, cls, jax.random.key(0), pos_iou=0.7, neg_iou=0.3,
    )
    labels = np.asarray(out.labels)
    weights = np.asarray(out.cls_weights)
    # ignored anchors exist and carry zero cls weight
    ig = labels == -1
    if ig.any():
        assert np.all(weights[ig] == 0.0)


def test_batched_vmap_shapes():
    anchors = make_anchors()
    gt = jnp.zeros((2, 5, 4)).at[0, 0].set(jnp.array([30.0, 30.0, 96.0, 96.0]))
    cls = jnp.zeros((2, 5), jnp.int32).at[0, 0].set(2)
    out = anchor_target(
        anchors, gt, cls, jax.random.key(0), pos_iou=0.5, neg_iou=0.4,
    )
    n = anchors.shape[0]
    assert out.labels.shape == (2, n)
    assert out.box_targets.shape == (2, n, 4)
    assert float(out.num_pos[0]) >= 1 and float(out.num_pos[1]) == 0
