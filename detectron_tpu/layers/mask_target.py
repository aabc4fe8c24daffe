"""Mask targets: crop gt masks to RoIs, fully on device.

Replaces the reference's host-side cv2 crop/resize of gt masks
(reference: libs/layers/mask_target.py; SURVEY.md §2.2 "Proposal target"):
the data pipeline rasterizes each gt instance ONCE into a fixed-size
``M0 x M0`` grid in its own gt-box frame; per training step, the target for a
sampled fg RoI is produced by bilinearly resampling that grid into the RoI
frame — separable bilinear as two batched MXU matmuls (tent-weight
interpolation matrices), static-shape and differentiation-free, inside the
jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def crop_gt_masks_to_rois(
    gt_masks: jnp.ndarray,  # [G, M0, M0] float in [0,1], gt-box frame
    gt_boxes: jnp.ndarray,  # [G, 4]
    rois: jnp.ndarray,  # [S, 4] sampled RoIs
    matched_idx: jnp.ndarray,  # [S] gt index per RoI
    resolution: int = 28,
) -> jnp.ndarray:
    """Returns [S, resolution, resolution] binary (0/1) targets."""
    m0 = gt_masks.shape[-1]
    g = gt_boxes[matched_idx]  # [S, 4]
    gw = jnp.maximum(g[:, 2] - g[:, 0], 1e-4)
    gh = jnp.maximum(g[:, 3] - g[:, 1], 1e-4)

    r = resolution
    # RoI-frame sample points in image coords
    fx = (jnp.arange(r) + 0.5) / r
    x = rois[:, 0:1] + fx[None, :] * (rois[:, 2:3] - rois[:, 0:1])  # [S, r]
    y = rois[:, 1:2] + fx[None, :] * (rois[:, 3:4] - rois[:, 1:2])  # [S, r]
    # map into gt-frame grid coords
    u = (x - g[:, 0:1]) / gw[:, None] * m0 - 0.5  # [S, r]
    v = (y - g[:, 1:2]) / gh[:, None] * m0 - 0.5

    # Separable bilinear as two batched MXU matmuls, exactly like the
    # windowed RoIAlign: a tent-weight interpolation matrix per axis
    # (weight at integer cell k = max(0, 1 - |k - c|) equals the classic
    # two-corner (1-f, f) split for any clipped coordinate, including the
    # c == m0-1 border where both corners coincide). The previous
    # four-corner double take_along_axis formulation lowered to four
    # ~11 ms serialized [S*r*r] gathers on TPU (profiled: ~45 ms of the
    # 300 ms train step); the matmuls are ~0.1 ms.
    def interp_matrix(c):  # [S, r] -> [S, r, m0]
        inb = (c > -1.0) & (c < m0)
        cc = jnp.clip(c, 0.0, m0 - 1.0)
        grid = jnp.arange(m0, dtype=cc.dtype)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(grid[None, None, :] - cc[:, :, None]))
        return jnp.where(inb[:, :, None], w, 0.0)

    wu = interp_matrix(u)  # [S, r, M0]
    wv = interp_matrix(v)  # [S, r, M0]
    masks = gt_masks[matched_idx].astype(jnp.float32)  # [S, M0, M0]

    # t[s, i, x] = sum_y wv[s, i, y] masks[s, y, x]
    t = jax.lax.dot_general(
        wv, masks,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    # out[s, i, j] = sum_x t[s, i, x] wu[s, j, x]
    out = jax.lax.dot_general(
        t, wu,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return (out >= 0.5).astype(jnp.float32)


def crop_gt_masks_batched(gt_masks, gt_boxes, rois, matched_idx, resolution=28):
    """Batched over images: gt_masks [B,G,M0,M0], rois [B,S,4]."""
    return jax.vmap(
        lambda m, b, r, i: crop_gt_masks_to_rois(m, b, r, i, resolution)
    )(gt_masks, gt_boxes, rois, matched_idx)
