"""RoI sampling (proposal targets) for the box/mask heads, on device.

Replaces the reference's host fg/bg sampling loop
(reference: libs/layers/roi_target.py — sample 512 RoIs/image with fg
IoU>=0.5 capped at 25%, bg IoU in [lo, hi), class labels + class-aware
encoded box targets; SURVEY.md §2.2 "Proposal target").

Static-shape redesign mirrors anchor_target: rank-based stochastic selection
with traced caps instead of host RNG filtering. Ground-truth boxes are
appended to the proposal set before sampling (as the reference does), which
guarantees fg availability early in training.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from detectron_tpu.layers.anchor_target import _rank_select
from detectron_tpu.ops import boxes as box_ops


class RoiTargets(NamedTuple):
    rois: jnp.ndarray  # [B, S, 4] sampled proposals
    labels: jnp.ndarray  # [B, S] int32: 0 bg (or padding), >0 class
    weights: jnp.ndarray  # [B, S] 1.0 where the RoI participates in cls loss
    box_targets: jnp.ndarray  # [B, S, 4]
    box_weights: jnp.ndarray  # [B, S] 1.0 for fg RoIs
    matched_idx: jnp.ndarray  # [B, S] gt index (for mask targets)
    num_fg: jnp.ndarray  # [B]


def sample_rois_single(
    rois: jnp.ndarray,  # [P, 4]
    roi_valid: jnp.ndarray,  # [P]
    gt_boxes: jnp.ndarray,  # [G, 4]
    gt_classes: jnp.ndarray,  # [G] (0 = padding)
    key: jax.Array,
    sample_size: int = 512,
    positive_fraction: float = 0.25,
    positive_iou: float = 0.5,
    negative_iou_hi: float = 0.5,
    negative_iou_lo: float = 0.0,
    box_weights=(10.0, 10.0, 5.0, 5.0),
    offset: float = 0.0,
) -> RoiTargets:
    gt_valid = gt_classes > 0
    # append gt boxes to the candidate set
    cand = jnp.concatenate([rois, gt_boxes], axis=0)
    cand_valid = jnp.concatenate([roi_valid, gt_valid], axis=0)

    iou = box_ops.bbox_overlaps(cand, gt_boxes, offset=offset)  # [P+G, G]
    masked_iou = jnp.where(gt_valid[None, :], iou, -1.0)
    # overlap with padded gt counts as 0 (no overlap), not -1: images with
    # zero valid gt must still yield background RoIs
    max_iou = jnp.max(jnp.where(gt_valid[None, :], iou, 0.0), axis=1)
    matched = jnp.argmax(masked_iou, axis=1).astype(jnp.int32)

    fg = cand_valid & (max_iou >= positive_iou) & jnp.any(gt_valid)
    bg = cand_valid & (max_iou < negative_iou_hi) & (max_iou >= negative_iou_lo)

    kf, kb = jax.random.split(key)
    fg_cap = jnp.int32(sample_size * positive_fraction)
    sel_fg = _rank_select(fg, jnp.minimum(fg_cap, jnp.sum(fg)), kf, max_cap=sample_size)
    bg_cap = sample_size - jnp.sum(sel_fg)
    sel_bg = _rank_select(bg, bg_cap, kb, max_cap=sample_size)

    # compact the selected RoIs to the front S slots: rank selected first
    sel = sel_fg | sel_bg
    order_key = jnp.where(sel_fg, 0, jnp.where(sel_bg, 1, 2)) * (cand.shape[0] * 2) + (
        jnp.arange(cand.shape[0])
    )
    order = jnp.argsort(order_key)[:sample_size]
    sel_s = sel[order]
    rois_s = jnp.where(sel_s[:, None], cand[order], 0.0)
    matched_s = matched[order]
    fg_s = sel_fg[order]
    labels = jnp.where(fg_s, gt_classes[matched_s].astype(jnp.int32), 0)
    targets = box_ops.encode_boxes(
        gt_boxes[matched_s], rois_s, weights=box_weights, offset=offset
    )
    targets = jnp.where(fg_s[:, None], targets, 0.0)
    return RoiTargets(
        rois=rois_s,
        labels=labels,
        weights=sel_s.astype(jnp.float32),
        box_targets=targets,
        box_weights=fg_s.astype(jnp.float32),
        matched_idx=jnp.where(fg_s, matched_s, 0),
        num_fg=jnp.sum(fg_s.astype(jnp.float32)),
    )


def sample_rois(rois, roi_valid, gt_boxes, gt_classes, key, **kwargs) -> RoiTargets:
    """Batched: rois [B,P,4], gt [B,G,...]."""
    keys = jax.random.split(key, rois.shape[0])
    return jax.vmap(
        lambda r, v, b, c, k: sample_rois_single(r, v, b, c, k, **kwargs)
    )(rois, roi_valid, gt_boxes, gt_classes, keys)
