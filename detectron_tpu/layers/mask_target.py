"""Mask targets: crop gt masks to RoIs, fully on device.

Replaces the reference's host-side cv2 crop/resize of gt masks
(reference: libs/layers/mask_target.py; SURVEY.md §2.2 "Proposal target"):
the data pipeline rasterizes each gt instance ONCE into a fixed-size
``M0 x M0`` grid in its own gt-box frame; per training step, the target for a
sampled fg RoI is produced by bilinearly resampling that grid into the RoI
frame — a static-shape gather, differentiation-free, inside the jitted step.
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

    def bil_1d(c):
        inb = (c > -1.0) & (c < m0)
        cc = jnp.clip(c, 0.0, m0 - 1.0)
        i0 = jnp.clip(jnp.floor(cc).astype(jnp.int32), 0, m0 - 1)
        i1 = jnp.minimum(i0 + 1, m0 - 1)
        f = cc - i0
        return i0, i1, 1.0 - f, f, inb

    u0, u1, wu0, wu1, uin = bil_1d(u)
    v0, v1, wv0, wv1, vin = bil_1d(v)

    masks = gt_masks[matched_idx]  # [S, M0, M0]

    def corner(vi, ui, wv, wu):
        vals = jnp.take_along_axis(
            jnp.take_along_axis(masks, vi[:, :, None], axis=1),
            ui[:, None, :].repeat(r, 1), axis=2,
        )
        return vals * (wv[:, :, None] * wu[:, None, :])

    out = (
        corner(v0, u0, wv0, wu0)
        + corner(v0, u1, wv0, wu1)
        + corner(v1, u0, wv1, wu0)
        + corner(v1, u1, wv1, wu1)
    )
    out = jnp.where(vin[:, :, None] & uin[:, None, :], out, 0.0)
    return (out >= 0.5).astype(jnp.float32)


def crop_gt_masks_batched(gt_masks, gt_boxes, rois, matched_idx, resolution=28):
    """Batched over images: gt_masks [B,G,M0,M0], rois [B,S,4]."""
    return jax.vmap(
        lambda m, b, r, i: crop_gt_masks_to_rois(m, b, r, i, resolution)
    )(gt_masks, gt_boxes, rois, matched_idx)
