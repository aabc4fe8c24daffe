"""Mask R-CNN: two-stage detector + mask head (reference: libs/nets/maskrcnn.py).

The shared two-stage skeleton lives in ``faster_rcnn.py``
(``build_two_stage(cfg, include_mask=True)``); this module adds the
mask-specific utilities:

  * training: mask targets via on-device gt-mask resampling
    (``layers/mask_target.py``) and own-class BCE (``losses.mask_bce_loss``)
    — already wired into ``faster_rcnn_train_forward``;
  * inference: the model returns per-detection 28x28 mask probabilities; the
    full-image paste (bilinear resize into the box rectangle, threshold 0.5
    — reference: mask pasting in test path, SURVEY.md §3.2) is provided both
    as a vectorized host function (for COCO RLE eval) and as an on-device
    variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def paste_masks_numpy(
    masks: np.ndarray,  # [D, M, M] probabilities
    boxes: np.ndarray,  # [D, 4]
    valid: np.ndarray,  # [D]
    image_hw: tuple[int, int],
    threshold: float = 0.5,
) -> np.ndarray:
    """Paste each mask into its box rectangle on the full image (host,
    vectorized per detection). Returns [D, H, W] uint8."""
    h, w = image_hw
    d, m, _ = masks.shape
    out = np.zeros((d, h, w), np.uint8)
    for i in range(d):
        if not valid[i]:
            continue
        x1, y1, x2, y2 = boxes[i]
        x1i, y1i = int(np.floor(x1)), int(np.floor(y1))
        x2i, y2i = int(np.ceil(x2)), int(np.ceil(y2))
        x2i, y2i = min(max(x2i, x1i + 1), w), min(max(y2i, y1i + 1), h)
        x1i, y1i = min(max(x1i, 0), w - 1), min(max(y1i, 0), h - 1)
        bw, bh = x2i - x1i, y2i - y1i
        if bw <= 0 or bh <= 0:  # box entirely outside the canvas
            continue
        # bilinear resize mask [M,M] -> [bh,bw]
        ys = (np.arange(bh) + 0.5) * (y2 - y1) / bh + y1
        xs = (np.arange(bw) + 0.5) * (x2 - x1) / bw + x1
        u = (xs - x1) / max(x2 - x1, 1e-4) * m - 0.5
        v = (ys - y1) / max(y2 - y1, 1e-4) * m - 0.5
        u0 = np.clip(np.floor(u).astype(int), 0, m - 1)
        v0 = np.clip(np.floor(v).astype(int), 0, m - 1)
        u1, v1 = np.minimum(u0 + 1, m - 1), np.minimum(v0 + 1, m - 1)
        fu = np.clip(u - u0, 0, 1)
        fv = np.clip(v - v0, 0, 1)
        mk = masks[i]
        top = mk[v0][:, u0] * (1 - fu) + mk[v0][:, u1] * fu
        bot = mk[v1][:, u0] * (1 - fu) + mk[v1][:, u1] * fu
        patch = top * (1 - fv[:, None]) + bot * fv[:, None]
        out[i, y1i:y2i, x1i:x2i] = (patch >= threshold).astype(np.uint8)
    return out


def paste_masks_rle(
    masks: np.ndarray,  # [D, M, M] probabilities
    boxes: np.ndarray,  # [D, 4]
    valid: np.ndarray,  # [D]
    image_hw: tuple[int, int],
    threshold: float = 0.5,
) -> list:
    """Fused paste + RLE encode: each mask's full-image column-major RLE is
    emitted directly from its box patch by the C++ codec (O(box area) per
    detection — the full canvas is never materialized or scanned).

    This is the eval-path replacement for
    ``RLE.encode(paste_masks_numpy(...))`` (the reference's classic eval
    bottleneck, SURVEY.md §3.2): bit-exact for float32 boxes (the C++
    kernel replicates the numpy interpolation math op-for-op;
    tests/test_mask_paste_rle.py) and ~50x faster per image.

    Returns a list of ``detectron_tpu.native.RLE`` (invalid rows -> empty
    masks). Falls back to the dense path without the native library.
    """
    import ctypes

    from detectron_tpu.native import RLE, _load, _ptr

    h, w = int(image_hw[0]), int(image_hw[1])
    lib = _load()
    if lib is None:  # no toolchain: dense fallback, identical results
        full = paste_masks_numpy(masks, boxes, valid, (h, w), threshold)
        return [RLE.encode(m) for m in full]
    masks = np.ascontiguousarray(masks, np.float32)
    boxes = np.ascontiguousarray(boxes, np.float32)
    valid = np.asarray(valid, bool)
    m = masks.shape[-1]
    buf = np.empty(h * w + 1, np.uint32)  # reused worst-case run buffer
    empty = np.asarray([h * w], np.uint32)
    out = []
    for i in range(len(masks)):
        if not valid[i]:
            out.append(RLE(h, w, empty))
            continue
        n = lib.rle_paste(
            _ptr(masks[i], ctypes.c_float), m,
            _ptr(boxes[i], ctypes.c_float), h, w,
            float(threshold), _ptr(buf, ctypes.c_uint32),
        )
        out.append(RLE(h, w, buf[:n].copy()))
    return out


def paste_masks_device(
    masks: jnp.ndarray,  # [D, M, M]
    boxes: jnp.ndarray,  # [D, 4]
    valid: jnp.ndarray,  # [D]
    image_hw: tuple[int, int],
    threshold: float = 0.5,
) -> jnp.ndarray:
    """On-device full-image paste: for each output pixel, inverse-map into
    mask coords and bilinear-sample. Static shapes; [D, H, W] bool."""
    h, w = image_hw
    m = masks.shape[-1]
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5

    def one(mask, box, ok):
        bw = jnp.maximum(box[2] - box[0], 1e-4)
        bh = jnp.maximum(box[3] - box[1], 1e-4)
        u = (xs - box[0]) / bw * m - 0.5  # [W]
        v = (ys - box[1]) / bh * m - 0.5  # [H]

        def bil(c):
            inb = (c >= -0.5) & (c <= m - 0.5)
            cc = jnp.clip(c, 0.0, m - 1.0)
            i0 = jnp.clip(jnp.floor(cc).astype(jnp.int32), 0, m - 1)
            i1 = jnp.minimum(i0 + 1, m - 1)
            return i0, i1, cc - i0, inb

        u0, u1, fu, uin = bil(u)
        v0, v1, fv, vin = bil(v)
        top = mask[v0][:, u0] * (1 - fu)[None, :] + mask[v0][:, u1] * fu[None, :]
        bot = mask[v1][:, u0] * (1 - fu)[None, :] + mask[v1][:, u1] * fu[None, :]
        patch = top * (1 - fv)[:, None] + bot * fv[:, None]
        inside = vin[:, None] & uin[None, :] & ok
        return (patch >= threshold) & inside

    return jax.vmap(one)(masks, boxes, valid)
