"""Box geometry: IoU overlaps, encode/decode, clip, area.

TPU-native replacement for the reference's native + NumPy box stack:
  * ``bbox_overlaps`` (reference: libs/boxes/cython_bbox.pyx) — here a fused,
    broadcasted jnp intersection/union that XLA keeps entirely on-chip and
    fuses into the downstream assignment ops;
  * ``bbox_transform`` / ``bbox_transform_inv`` / ``clip_boxes`` (reference:
    libs/boxes/bbox_transform.py) — pure jnp, differentiable where needed.

Boxes are ``(x1, y1, x2, y2)`` in pixel coordinates, shape ``[..., 4]``.
All functions are shape-polymorphic over leading dims and jit/vmap-safe.

The py-faster-rcnn lineage measures width as ``x2 - x1 + 1`` (the legacy
"+1" convention). That convention is supported via ``offset`` so parity tests
against reference semantics can enable it; the default is the modern
``offset=0`` convention used by our zoo configs.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-8

# Log-space box size clamp, ln(1000/16): keeps exp() in decode finite
# (same guard as Detectron's BBOX_XFORM_CLIP).
BBOX_XFORM_CLIP = 4.135166556742356


def box_wh(boxes: jnp.ndarray, offset: float = 0.0):
    """Widths/heights of boxes. offset=1 selects the legacy +1 convention."""
    w = boxes[..., 2] - boxes[..., 0] + offset
    h = boxes[..., 3] - boxes[..., 1] + offset
    return w, h


def box_area(boxes: jnp.ndarray, offset: float = 0.0) -> jnp.ndarray:
    w, h = box_wh(boxes, offset)
    return jnp.maximum(w, 0.0) * jnp.maximum(h, 0.0)


def bbox_overlaps(
    boxes: jnp.ndarray, query_boxes: jnp.ndarray, offset: float = 0.0
) -> jnp.ndarray:
    """Dense IoU matrix between ``boxes [N,4]`` and ``query_boxes [K,4]``.

    Returns ``[N, K]`` IoU. Equivalent of the reference's cython
    ``bbox_overlaps`` but computed as one fused broadcasted expression on
    device (O(N*K) VPU work, no host loop).
    """
    b = boxes[..., :, None, :]  # [N,1,4]
    q = query_boxes[..., None, :, :]  # [1,K,4]
    lt = jnp.maximum(b[..., :2], q[..., :2])
    rb = jnp.minimum(b[..., 2:], q[..., 2:])
    wh = jnp.maximum(rb - lt + offset, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_b = box_area(boxes, offset)[..., :, None]
    area_q = box_area(query_boxes, offset)[..., None, :]
    union = area_b + area_q - inter
    return inter / jnp.maximum(union, EPS)


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray, offset: float = 0.0):
    """Elementwise IoU of two aligned box arrays ``[..., 4]``."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt + offset, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a, offset) + box_area(b, offset) - inter
    return inter / jnp.maximum(union, EPS)


def encode_boxes(
    boxes: jnp.ndarray,
    anchors: jnp.ndarray,
    weights=(1.0, 1.0, 1.0, 1.0),
    offset: float = 0.0,
) -> jnp.ndarray:
    """Encode target ``boxes`` relative to ``anchors`` as (tx, ty, tw, th).

    tx=(gx-ax)/aw, ty=(gy-ay)/ah, tw=log(gw/aw), th=log(gh/ah), then * weights
    (reference: libs/boxes/bbox_transform.py::bbox_transform; weights are the
    reciprocal of the reference's target stds).
    """
    aw, ah = box_wh(anchors, offset)
    ax = anchors[..., 0] + 0.5 * aw
    ay = anchors[..., 1] + 0.5 * ah
    gw, gh = box_wh(boxes, offset)
    gx = boxes[..., 0] + 0.5 * gw
    gy = boxes[..., 1] + 0.5 * gh
    aw = jnp.maximum(aw, EPS)
    ah = jnp.maximum(ah, EPS)
    wx, wy, ww, wh_ = weights
    tx = wx * (gx - ax) / aw
    ty = wy * (gy - ay) / ah
    tw = ww * jnp.log(jnp.maximum(gw, EPS) / aw)
    th = wh_ * jnp.log(jnp.maximum(gh, EPS) / ah)
    return jnp.stack([tx, ty, tw, th], axis=-1)


def decode_boxes(
    deltas: jnp.ndarray,
    anchors: jnp.ndarray,
    weights=(1.0, 1.0, 1.0, 1.0),
    offset: float = 0.0,
) -> jnp.ndarray:
    """Inverse of :func:`encode_boxes` with exp clamping.

    (reference: libs/boxes/bbox_transform.py::bbox_transform_inv)
    """
    aw, ah = box_wh(anchors, offset)
    ax = anchors[..., 0] + 0.5 * aw
    ay = anchors[..., 1] + 0.5 * ah
    wx, wy, ww, wh_ = weights
    tx = deltas[..., 0] / wx
    ty = deltas[..., 1] / wy
    tw = jnp.minimum(deltas[..., 2] / ww, BBOX_XFORM_CLIP)
    th = jnp.minimum(deltas[..., 3] / wh_, BBOX_XFORM_CLIP)
    cx = tx * aw + ax
    cy = ty * ah + ay
    w = jnp.exp(tw) * aw
    h = jnp.exp(th) * ah
    return jnp.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w - offset, cy + 0.5 * h - offset],
        axis=-1,
    )


def clip_boxes(boxes: jnp.ndarray, height, width, offset: float = 0.0):
    """Clip boxes to ``[0, width-offset] x [0, height-offset]``.

    (reference: libs/boxes/bbox_transform.py::clip_boxes). ``height``/``width``
    may be traced scalars (per-image im_info) or Python floats.
    """
    x1 = jnp.clip(boxes[..., 0], 0.0, width - offset)
    y1 = jnp.clip(boxes[..., 1], 0.0, height - offset)
    x2 = jnp.clip(boxes[..., 2], 0.0, width - offset)
    y2 = jnp.clip(boxes[..., 3], 0.0, height - offset)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def valid_box_mask(boxes: jnp.ndarray, min_size: float = 0.0, offset: float = 0.0):
    """Mask of boxes with both sides >= min_size (replaces the reference's
    dynamic ``filter_boxes``: we mask instead of filtering, keeping shapes
    static — reference: libs/layers/proposal.py min-size filter)."""
    w, h = box_wh(boxes, offset)
    return (w >= min_size) & (h >= min_size)
