"""Detection losses.

Equivalents of the reference's loss stack (reference: smooth-L1/CE in
libs/nets/model.py + libs/layers/, sigmoid focal loss in
libs/nets/focal_loss.py; SURVEY.md §2.2 "Losses"). All losses are
mask-weighted (padding-aware) and reduce with explicit normalizers so padded
entries are exact no-ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1(pred, target, sigma: float = 1.0):
    """Elementwise smooth-L1 with the reference's sigma parameterization:
    0.5*(sigma*x)^2 if |x| < 1/sigma^2 else |x| - 0.5/sigma^2."""
    s2 = sigma * sigma
    diff = pred - target
    a = jnp.abs(diff)
    return jnp.where(a < 1.0 / s2, 0.5 * s2 * diff * diff, a - 0.5 / s2)


def smooth_l1_beta(pred, target, beta: float):
    """Detectron beta form: 0.5*x^2/beta if |x| < beta else |x| - beta/2."""
    diff = pred - target
    a = jnp.abs(diff)
    if beta <= 0.0:
        return a
    return jnp.where(a < beta, 0.5 * diff * diff / beta, a - 0.5 * beta)


def softmax_cross_entropy(logits, labels, weights=None, normalizer=None):
    """Mean CE over weighted entries. labels: int [N]; logits: [N, K]."""
    ll = jax.nn.log_softmax(logits)
    ce = -jnp.take_along_axis(ll, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    if weights is None:
        weights = jnp.ones_like(ce)
    if normalizer is None:
        normalizer = jnp.maximum(jnp.sum(weights), 1.0)
    return jnp.sum(ce * weights) / normalizer


def sigmoid_focal_loss(
    logits, labels_onehot, alpha: float = 0.25, gamma: float = 2.0,
    weights=None, normalizer=None,
):
    """Focal loss (RetinaNet): FL = -alpha_t (1-p_t)^gamma log(p_t).

    logits/labels_onehot: [..., K]; weights: broadcastable to [...]
    (per-anchor), applied before normalization by ``normalizer`` (typically
    the number of positive anchors).
    """
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, labels_onehot)
    p_t = p * labels_onehot + (1.0 - p) * (1.0 - labels_onehot)
    alpha_t = alpha * labels_onehot + (1.0 - alpha) * (1.0 - labels_onehot)
    loss = alpha_t * ((1.0 - p_t) ** gamma) * ce
    loss = jnp.sum(loss, axis=-1)
    if weights is not None:
        loss = loss * weights
    if normalizer is None:
        normalizer = 1.0
    return jnp.sum(loss) / jnp.maximum(normalizer, 1.0)


def optax_sigmoid_ce(logits, labels):
    """Numerically stable sigmoid cross-entropy."""
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def mask_bce_loss(mask_logits, mask_targets, class_ids, weights, normalizer=None):
    """BCE on each fg RoI's own class channel only (Mask R-CNN rule,
    reference: mask loss in libs/nets/maskrcnn.py).

    mask_logits: [R, M, M, K]; mask_targets: [R, M, M] in {0,1};
    class_ids: [R] int (1-based fg classes; channel k-1 is used);
    weights: [R] (1 for fg RoIs, 0 for padding/bg).
    """
    k = jnp.clip(class_ids - 1, 0, mask_logits.shape[-1] - 1)
    own = jnp.take_along_axis(
        mask_logits, k[:, None, None, None].astype(jnp.int32), axis=-1
    )[..., 0]
    ce = optax_sigmoid_ce(own, mask_targets)
    per_roi = jnp.mean(ce, axis=(1, 2))
    if normalizer is None:
        normalizer = jnp.maximum(jnp.sum(weights), 1.0)
    return jnp.sum(per_roi * weights) / normalizer
