"""RoIAlign / RoIPool: static-shape, on-device, differentiable.

TPU-native replacement for the reference's CUDA ops
(reference: libs/roi_align/src/roi_align_kernel.cu + roi_align.py and
libs/roi_pooling/src/roi_pooling_kernel.cu + roi_pool.py).

Design (SURVEY.md §7):
  * All FPN levels are flattened spatially and concatenated into ONE padded
    feature table ``[B, sum_l Hl*Wl, C]``; each RoI computes flat gather
    indices ``offset[level] + y * W[level] + x``. One gather path serves every
    level — no per-level masking or 4x duplicated compute.
  * Bilinear sampling follows Caffe2/Detectron semantics exactly: per output
    bin, ``sampling_ratio**2`` sample points, 4-neighbor bilinear with the
    border rule (points with ``y < -1 or y > H`` contribute zero; otherwise
    coords clamp to ``[0, size-1]``), averaged over samples.
  * The backward pass is the automatic transpose of gather (scatter-add) —
    no custom VJP needed for correctness; a fused Pallas kernel for the hot
    path lives in ``detectron_tpu.ops.roi_align_pallas``.
  * RoI-to-FPN-level assignment: ``k = floor(k0 + log2(sqrt(area)/224))``
    clamped to the available levels (the heuristic the reference applies when
    routing RoIs to pyramid levels, SURVEY.md §3.1).

RoIPool deviation note: the reference's RoIPool uses data-dependent integer
bin boundaries (dynamic shapes). We implement it as max over a fixed dense
sample grid per bin (same spirit, static shape); RoIAlign is the production
path and is exact.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def assign_fpn_levels(
    rois: jnp.ndarray,
    num_levels: int,
    min_level: int,
    canonical_level: int = 4,
    canonical_scale: float = 224.0,
) -> jnp.ndarray:
    """Per-RoI pyramid level index in ``[0, num_levels)``.

    rois: [..., 4]. Uses k = floor(k0 + log2(sqrt(wh)/224)).
    """
    w = jnp.maximum(rois[..., 2] - rois[..., 0], 0.0)
    h = jnp.maximum(rois[..., 3] - rois[..., 1], 0.0)
    scale = jnp.sqrt(w * h)
    k = jnp.floor(
        canonical_level + jnp.log2(scale / canonical_scale + 1e-8)
    ).astype(jnp.int32)
    return jnp.clip(k - min_level, 0, num_levels - 1)


def _sample_coords(lo, size, pool, ratio):
    """Continuous sample coordinates along one axis.

    lo: [R] start (feature coords); size: [R] RoI extent (feature coords).
    Returns [R, pool*ratio].
    """
    bin_size = size / pool
    # sample j of bin p sits at (p + (j + 0.5)/ratio) * bin_size
    pos = np.repeat(np.arange(pool), ratio) + np.tile((np.arange(ratio) + 0.5) / ratio, pool)
    pos = jnp.asarray(pos, jnp.float32)  # [pool*ratio]
    return lo[:, None] + pos[None, :] * bin_size[:, None]


def _bilinear_1d(coord, limit):
    """Indices and weights for 1-D bilinear interp with Caffe2 border rule.

    coord: [...]; limit: int axis size. Returns (i0, i1, w0, w1, inb) where
    inb marks points inside [-1, limit].
    """
    limit = jnp.asarray(limit, coord.dtype)
    inb = (coord >= -1.0) & (coord <= limit)
    c = jnp.clip(coord, 0.0, limit - 1.0)
    i0 = jnp.floor(c).astype(jnp.int32)
    hi = (limit - 1.0).astype(jnp.int32)
    i0 = jnp.clip(i0, 0, hi)
    i1 = jnp.minimum(i0 + 1, hi)
    frac = c - i0.astype(c.dtype)
    return i0, i1, 1.0 - frac, frac, inb


def multilevel_roi_align(
    features: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    strides: Sequence[int],
    output_size: int = 7,
    sampling_ratio: int = 2,
    min_level: int | None = None,
    canonical_level: int = 4,
    canonical_scale: float = 224.0,
    aligned: bool = False,
) -> jnp.ndarray:
    """RoIAlign over an FPN, one fused gather path.

    Args:
      features: per-level ``[B, Hl, Wl, C]`` (NHWC), finest first.
      rois: ``[B, R, 4]`` boxes in image coordinates (padding rows fine —
        their outputs are garbage-but-finite; mask downstream).
      strides: per-level feature strides, e.g. (4, 8, 16, 32).
      output_size: P (7 box head / 14 mask head).
      sampling_ratio: samples per bin axis (2 -> 4 samples per bin).

    Returns:
      ``[B, R, P, P, C]`` pooled features.
    """
    num_levels = len(features)
    assert len(strides) == num_levels
    if min_level is None:
        min_level = int(np.log2(strides[0]))
    P, S = output_size, sampling_ratio
    PS = P * S
    B, _, _, C = features[0].shape

    hs = np.array([f.shape[1] for f in features])
    ws = np.array([f.shape[2] for f in features])
    offsets = np.concatenate([[0], np.cumsum(hs * ws)[:-1]])
    flat = jnp.concatenate(
        [f.reshape(B, -1, C) for f in features], axis=1
    )  # [B, L, C]

    strides_arr = jnp.asarray(np.array(strides, np.float32))
    hs_arr = jnp.asarray(hs.astype(np.float32))
    ws_arr = jnp.asarray(ws.astype(np.float32))
    wi_arr = jnp.asarray(ws.astype(np.int32))
    off_arr = jnp.asarray(offsets.astype(np.int32))

    def per_image(feat_flat, rois_i):  # [L, C], [R, 4]
        lvl = assign_fpn_levels(
            rois_i, num_levels, min_level, canonical_level, canonical_scale
        )  # [R]
        scale = 1.0 / strides_arr[lvl]
        H = hs_arr[lvl]
        W = ws_arr[lvl]
        Wi = wi_arr[lvl]
        off = off_arr[lvl]
        shift = 0.5 if aligned else 0.0
        x1 = rois_i[:, 0] * scale - shift
        y1 = rois_i[:, 1] * scale - shift
        rw = jnp.maximum(rois_i[:, 2] * scale - shift - x1, 1.0 if not aligned else 0.0)
        rh = jnp.maximum(rois_i[:, 3] * scale - shift - y1, 1.0 if not aligned else 0.0)

        xs = _sample_coords(x1, rw, P, S)  # [R, PS]
        ys = _sample_coords(y1, rh, P, S)  # [R, PS]

        x0, x1i, wx0, wx1, xin = _bilinear_1d(xs, W[:, None])
        y0, y1i, wy0, wy1, yin = _bilinear_1d(ys, H[:, None])

        def corner(yi, xi, wy, wx):
            # flat index [R, PS, PS]
            idx = (
                off[:, None, None]
                + yi[:, :, None] * Wi[:, None, None]
                + xi[:, None, :]
            )
            vals = feat_flat[idx.reshape(-1)].reshape(idx.shape + (C,))
            w = (wy[:, :, None] * wx[:, None, :])[..., None]
            return vals * w

        pts = (
            corner(y0, x0, wy0, wx0)
            + corner(y0, x1i, wy0, wx1)
            + corner(y1i, x0, wy1, wx0)
            + corner(y1i, x1i, wy1, wx1)
        )  # [R, PS, PS, C]
        inb = (yin[:, :, None] & xin[:, None, :])[..., None]
        pts = jnp.where(inb, pts, 0.0)
        # average the S x S samples inside each bin
        pts = pts.reshape(-1, P, S, P, S, C)
        return jnp.mean(pts, axis=(2, 4))  # [R, P, P, C]

    return jax.vmap(per_image)(flat, rois)


def roi_align(
    feature: jnp.ndarray,
    rois: jnp.ndarray,
    stride: int,
    output_size: int = 7,
    sampling_ratio: int = 2,
    aligned: bool = False,
) -> jnp.ndarray:
    """Single-level RoIAlign. feature: [B, H, W, C]; rois: [B, R, 4]."""
    return multilevel_roi_align(
        [feature],
        rois,
        [stride],
        output_size=output_size,
        sampling_ratio=sampling_ratio,
        aligned=aligned,
    )


def roi_pool(
    feature: jnp.ndarray,
    rois: jnp.ndarray,
    stride: int,
    output_size: int = 7,
    samples_per_bin: int = 4,
) -> jnp.ndarray:
    """RoIPool (max) with a fixed sample grid per bin; nearest-neighbor reads.

    Static-shape stand-in for the reference's dynamic-bin RoIPooling
    (reference: libs/roi_pooling/src/roi_pooling_kernel.cu). See module
    docstring for the deviation note.
    """
    B, H, W, C = feature.shape
    P, S = output_size, samples_per_bin
    flat = feature.reshape(B, H * W, C)

    def per_image(feat_flat, rois_i):
        scale = 1.0 / stride
        x1 = jnp.floor(rois_i[:, 0] * scale)
        y1 = jnp.floor(rois_i[:, 1] * scale)
        x2 = jnp.ceil(rois_i[:, 2] * scale)
        y2 = jnp.ceil(rois_i[:, 3] * scale)
        rw = jnp.maximum(x2 - x1, 1.0)
        rh = jnp.maximum(y2 - y1, 1.0)
        xs = _sample_coords(x1, rw, P, S)
        ys = _sample_coords(y1, rh, P, S)
        xi = jnp.clip(jnp.floor(xs), 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(jnp.floor(ys), 0, H - 1).astype(jnp.int32)
        idx = yi[:, :, None] * W + xi[:, None, :]  # [R, PS, PS]
        vals = feat_flat[idx.reshape(-1)].reshape(idx.shape + (C,))
        vals = vals.reshape(-1, P, S, P, S, C)
        return jnp.max(vals, axis=(2, 4))

    return jax.vmap(per_image)(flat, rois)
