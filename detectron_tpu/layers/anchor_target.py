"""Anchor target assignment, fully on-device with static shapes.

Replaces the reference's host-side NumPy + cython_bbox loop
(reference: libs/layers/anchor_target.py, SURVEY.md §2.2 "Anchor target
layer"): per image, IoU(anchors, gt) -> positive/negative/ignore labels by
thresholds, force-matching the best anchor of each gt, optional RPN-style
random subsampling.

TPU-first redesign of the dynamic parts:
  * padded gt (``gt_classes == 0`` marks padding) is masked, never filtered;
  * "subsample 256 anchors, <=50% positive" becomes *rank-based stochastic
    selection*: each eligible anchor draws a random key, and an anchor is
    selected iff its rank among its group is below a traced cap — identical
    sampling distribution, static shapes, no host RNG (SURVEY.md §7 hard
    part 3);
  * outputs are dense [B, N] label/weight/target arrays that the loss
    consumes directly — assignment compiles into the train step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from detectron_tpu.ops import boxes as box_ops


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray  # [B, N] int32: -1 ignore, 0 bg, >0 matched gt class
    matched_idx: jnp.ndarray  # [B, N] int32 index into gt arrays
    cls_weights: jnp.ndarray  # [B, N] float: 1 where the cls loss counts
    box_targets: jnp.ndarray  # [B, N, 4] encoded regression targets
    box_weights: jnp.ndarray  # [B, N] float: 1 where the box loss counts
    num_pos: jnp.ndarray  # [B] float: positive count (loss normalizer)


def _rank_select(eligible: jnp.ndarray, cap, key, max_cap: int = 0) -> jnp.ndarray:
    """Select up to ``cap`` (traced scalar ok) of the ``eligible`` entries
    uniformly at random; returns a bool mask. Static-shape equivalent of
    ``npr.choice(inds, size=cap, replace=False)`` in the reference.

    ``max_cap``: static upper bound on cap (e.g. the sample size). When
    given, selection runs as a bounded ``top_k`` + scatter instead of a full
    argsort — O(N log k) vs O(N log N), which matters at 200k anchors.
    """
    n = eligible.shape[0]
    noise = jax.random.uniform(key, (n,))
    if max_cap and max_cap < n:
        score = jnp.where(eligible, noise, -1.0)
        top_v, top_i = jax.lax.top_k(score, max_cap)
        take = (jnp.arange(max_cap) < cap) & (top_v > -0.5)
        return jnp.zeros((n,), bool).at[top_i].set(take)
    score = jnp.where(eligible, noise, 2.0)  # ineligible sorts last
    order = jnp.argsort(score)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return eligible & (rank < cap)


def anchor_target_single(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_classes: jnp.ndarray,
    key: jax.Array,
    pos_iou: float,
    neg_iou: float,
    force_match: bool = True,
    sample_size: int = 0,
    pos_fraction: float = 0.5,
    box_weights=(1.0, 1.0, 1.0, 1.0),
    offset: float = 0.0,
) -> AnchorTargets:
    """Single-image assignment. anchors [N,4]; gt_boxes [G,4]; gt_classes [G]
    (0 = padding row). sample_size=0 disables subsampling (RetinaNet)."""
    n = anchors.shape[0]
    gt_valid = gt_classes > 0
    iou = box_ops.bbox_overlaps(anchors, gt_boxes, offset=offset)  # [N, G]
    iou = jnp.where(gt_valid[None, :], iou, -1.0)

    max_iou = jnp.max(iou, axis=1)  # [N]
    matched = jnp.argmax(iou, axis=1).astype(jnp.int32)  # [N]

    pos = max_iou >= pos_iou
    # anchors overlapping nothing (incl. images with zero gt) are negatives
    neg = max_iou < neg_iou
    if force_match:
        # every valid gt's best anchor(s) become positive, ties included
        # (reference: gt_argmax_overlaps with tie expansion)
        per_gt_max = jnp.max(iou, axis=0)  # [G]
        is_best = (iou >= per_gt_max[None, :] - 1e-6) & gt_valid[None, :] & (
            iou > 0.0
        )
        forced = jnp.any(is_best, axis=1)
        # re-point matched idx at the gt we are the best anchor for
        forced_gt = jnp.argmax(is_best, axis=1).astype(jnp.int32)
        matched = jnp.where(forced & ~pos, forced_gt, matched)
        pos = pos | forced
        neg = neg & ~forced

    if sample_size:
        kp, kn = jax.random.split(key)
        pos_cap = jnp.int32(sample_size * pos_fraction)
        sel_pos = _rank_select(
            pos, jnp.minimum(pos_cap, jnp.sum(pos)), kp, max_cap=sample_size
        )
        neg_cap = sample_size - jnp.sum(sel_pos)
        sel_neg = _rank_select(neg, neg_cap, kn, max_cap=sample_size)
        cls_w = (sel_pos | sel_neg).astype(jnp.float32)
        pos_w = sel_pos.astype(jnp.float32)
    else:
        cls_w = (pos | neg).astype(jnp.float32)  # in-between stays ignored
        pos_w = pos.astype(jnp.float32)

    # Gather gt rows by per-anchor index as a one-hot matmul: a [N]-row
    # dynamic gather with 4-wide rows lowers to ~12-15 ms serialized
    # fusions on TPU at N=262k (profiled ~26 ms of the train step); the
    # [N, G] one-hot contraction is fused by XLA and costs ~0.1 ms.
    # HIGHEST precision: coordinates must not be bf16-quantized.
    g = gt_boxes.shape[0]
    onehot = (matched[:, None] == jnp.arange(g, dtype=jnp.int32)[None, :])
    gt_rows = jax.lax.dot_general(
        onehot.astype(jnp.float32),
        jnp.concatenate(
            [gt_boxes, gt_classes.astype(jnp.float32)[:, None]], axis=1),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [N, 5]: matched gt box + class
    labels = jnp.where(
        pos, gt_rows[:, 4].astype(jnp.int32), jnp.where(neg, 0, -1)
    )
    targets = box_ops.encode_boxes(
        gt_rows[:, :4], anchors, weights=box_weights, offset=offset
    )
    targets = jnp.where(pos[:, None], targets, 0.0)
    return AnchorTargets(
        labels=labels,
        matched_idx=matched,
        cls_weights=cls_w,
        box_targets=targets,
        box_weights=pos_w,
        num_pos=jnp.sum(pos_w),
    )


def anchor_target(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_classes: jnp.ndarray,
    key: jax.Array,
    **kwargs,
) -> AnchorTargets:
    """Batched assignment: gt_boxes [B,G,4], gt_classes [B,G]."""
    keys = jax.random.split(key, gt_boxes.shape[0])
    return jax.vmap(
        lambda b, c, k: anchor_target_single(anchors, b, c, k, **kwargs)
    )(gt_boxes, gt_classes, keys)
