"""Pallas TPU kernel for multilevel RoIAlign (forward).

The flagship kernel (BASELINE.json north star). Replaces the reference's
CUDA RoIAlign (reference: libs/roi_align/src/roi_align_kernel.cu) with a
TPU-shaped algorithm:

  * grid = one program per RoI (sequential on TPU);
  * the RoI's assigned FPN level window is DMA'd HBM -> VMEM once
    (windows are small by construction: the level-assignment heuristic
    bounds RoI extent to < 28 feature cells on P2..P4, and the coarsest
    level is used whole — so a 32x32 window is always exact);
  * bilinear sampling is expressed as two *separable interpolation
    matmuls* on the MXU: ``pooled = Wy @ window @ Wx^T`` where
    ``Wy[p, y] = (1/s) * sum_i max(0, 1 - |y - sy(p,i)|)`` folds the
    bilinear weights AND the s^2-sample averaging of each bin into one
    [P, win] matrix (bilinear interpolation is linear, so the average of
    interpolated samples equals interpolation with averaged weights);
  * Caffe2 border semantics (zero outside [-1, size], clamp inside) are
    folded into the weight matrices — bit-compatible with ops/roi_align.py,
    which is the oracle for this kernel.

The backward pass uses the jnp implementation's autodiff (gather transpose)
via jax.custom_vjp, so training keeps exact gradients while inference gets
the fast kernel.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from detectron_tpu.ops.roi_align import assign_fpn_levels, multilevel_roi_align

WINDOW = 32  # feature-cell window for non-coarsest levels (see docstring)


def _interp_matrix(lo, extent, offset_in_window, win: int, limit, pool: int,
                   ratio: int):
    """[pool, win] folded bilinear+average interpolation matrix.

    lo: RoI start (feature coords, scalar); extent: RoI extent (scalar);
    offset_in_window: window origin (scalar int); limit: level size (static).
    """
    bin_size = extent / pool
    # sample positions pos[k] = (k // ratio) + ((k % ratio) + 0.5) / ratio,
    # computed with in-kernel iota (no captured constants)
    k = jax.lax.broadcasted_iota(jnp.int32, (pool * ratio, win), 0)
    pos = (k // ratio).astype(jnp.float32) + (
        (k % ratio).astype(jnp.float32) + 0.5
    ) / float(ratio)
    s = lo + pos * bin_size  # [pool*ratio, win] global feature coords
    inb = (s >= -1.0) & (s <= float(limit))
    sc = jnp.clip(s, 0.0, float(limit) - 1.0) - offset_in_window.astype(jnp.float32)
    # window-edge clamp: replicate border for samples outside the window
    # (only reachable for extreme-aspect RoIs; see _make_kernel notes)
    sc = jnp.clip(sc, 0.0, float(win) - 1.0)
    y = jax.lax.broadcasted_iota(jnp.int32, (pool * ratio, win), 1).astype(
        jnp.float32
    )
    w = jnp.maximum(0.0, 1.0 - jnp.abs(y - sc))  # [pool*ratio, win]
    w = jnp.where(inb, w, 0.0)
    # fold the ratio-sample average: sum groups of `ratio` rows, / ratio
    w = w.reshape(pool, ratio, win).sum(axis=1) / float(ratio)
    return w  # [pool, win]


def _make_kernel(level_shapes, orig_wls, strides, pool, ratio, out_dtype):
    """level_shapes: list of (H, W, C) static (W possibly padded for DMA
    alignment); orig_wls: the pre-padding widths, used as the border-clamp
    limits so padded zero columns are never sampled."""
    num_levels = len(level_shapes)
    # W-dim DMA starts must be 8-aligned (HBM (8,128) tiling on the last two
    # dims), so x-windows get +8 slack and starts are floored to 8; the
    # H dim is untiled and needs no slack. Levels that fit in 48 cells are
    # used WHOLE (exactness for the clamped coarsest level, where RoI spans
    # are unbounded). Larger levels: the level-assignment heuristic bounds
    # sqrt(w*h)/stride < 28, so a 64-cell window is exact up to ~5:1 aspect
    # ratio; beyond that, samples border-replicate at the window edge (the
    # _interp_matrix clamp) — a bounded approximation for extreme shapes.
    wins = [
        (min(h, 2 * WINDOW), min(w, 2 * WINDOW + 8))
        for (h, w, _) in level_shapes
    ]
    # coarsest levels smaller than WINDOW are used whole (exactness guarantee)
    c = level_shapes[0][2]
    max_wh = max(w[0] for w in wins)
    max_ww = max(w[1] for w in wins)

    def kernel(rois_ref, lvl_ref, bidx_ref, *refs):
        feat_refs = refs[:num_levels]
        out_ref = refs[num_levels]
        win_scratch = refs[num_levels + 1]  # [2, wh, ww, C] double buffer
        sems = refs[num_levels + 2]  # DMA sems [2]
        n = pl.program_id(0)
        n_total = pl.num_programs(0)

        def window_geom(m, l):
            """(y0, x0) window origin for RoI m at (static) level l, plus the
            feature-coord RoI box. Deterministic in the scalar prefetch, so
            start and wait sites reconstruct the identical DMA."""
            hl, wl, _ = level_shapes[l]
            win_h, win_w = wins[l]
            scale = 1.0 / strides[l]
            fx1 = rois_ref[m, 0] * scale
            fy1 = rois_ref[m, 1] * scale
            fw = jnp.maximum(rois_ref[m, 2] * scale - fx1, 1.0)
            fh = jnp.maximum(rois_ref[m, 3] * scale - fy1, 1.0)
            y0 = jnp.clip(jnp.floor(fy1).astype(jnp.int32) - 1, 0, hl - win_h)
            x0 = jnp.clip(jnp.floor(fx1).astype(jnp.int32) - 1, 0, wl - win_w)
            x0 = pl.multiple_of((x0 // 8) * 8, 8)
            return fx1, fy1, fw, fh, y0, x0

        def dma_for(m, slot, l):
            win_h, win_w = wins[l]
            _, _, _, _, y0, x0 = window_geom(m, l)
            return pltpu.make_async_copy(
                feat_refs[l].at[
                    bidx_ref[m], pl.ds(y0, win_h), pl.ds(x0, win_w), :
                ],
                win_scratch.at[slot, pl.ds(0, win_h), pl.ds(0, win_w), :],
                sems.at[slot],
            )

        def start_for(m, slot):
            for l in range(num_levels):
                @pl.when(lvl_ref[m] == l)
                def _():
                    dma_for(m, slot, l).start()

        # warm-up: program 0 starts its own window's DMA
        @pl.when(n == 0)
        def _():
            start_for(0, 0)

        # prefetch the NEXT RoI's window into the other buffer
        @pl.when(n + 1 < n_total)
        def _():
            start_for(n + 1, (n + 1) % 2)

        slot = n % 2
        for l in range(num_levels):
            hl, wl, _ = level_shapes[l]
            wl_clamp = orig_wls[l]
            win_h, win_w = wins[l]

            @pl.when(lvl_ref[n] == l)
            def _():
                fx1, fy1, fw, fh, y0, x0 = window_geom(n, l)
                wy = _interp_matrix(fy1, fh, y0, win_h, hl, pool, ratio)
                wx = _interp_matrix(fx1, fw, x0, win_w, wl_clamp, pool, ratio)
                dma_for(n, slot, l).wait()
                win = win_scratch[slot, pl.ds(0, win_h), pl.ds(0, win_w), :]
                win_f = win.astype(jnp.float32).reshape(win_h, win_w * c)
                # HIGHEST precision: default MXU f32 matmul is single-pass
                # bf16 (~1% error); interpolation weights need full f32.
                tmp = jnp.dot(
                    wy, win_f, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                ).reshape(pool, win_w, c)
                # out[p, q, ch] = sum_x wx[q, x] * tmp[p, x, ch]
                out = jax.lax.dot_general(
                    tmp, wx,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # [pool, c, pool_q]
                out_ref[0] = jnp.transpose(out, (0, 2, 1)).astype(out_dtype)

    return kernel, (max_wh, max_ww, c)


@functools.partial(
    jax.jit,
    static_argnames=(
        "strides", "output_size", "sampling_ratio", "min_level", "interpret"
    ),
)
def multilevel_roi_align_pallas(
    features: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    strides: Sequence[int] = (4, 8, 16, 32),
    output_size: int = 7,
    sampling_ratio: int = 2,
    min_level: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Same contract as ops.roi_align.multilevel_roi_align (aligned=False).

    features: per-level [B, Hl, Wl, C]; rois: [B, R, 4] -> [B, R, P, P, C].
    """
    num_levels = len(features)
    if min_level is None:
        min_level = int(np.log2(strides[0]))
    b, r = rois.shape[:2]
    c = features[0].shape[-1]
    p = output_size
    dtype = features[0].dtype

    flat_rois = rois.reshape(b * r, 4)
    lvl = assign_fpn_levels(flat_rois, num_levels, min_level).astype(jnp.int32)
    bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)

    # exactness guard: the coarsest level must fit its window whole, since
    # top-clamped RoIs have unbounded span (holds for images <= ~1536px);
    # Mosaic also needs C % 128 == 0 for the in-kernel [H, W*C] reshape.
    # NB: decide BEFORE any padding — the fallback must see the original
    # level extents (border clamping depends on them).
    top_h, top_w = features[-1].shape[1:3]
    if top_h > 48 or top_w > 48 or c % 128 != 0:
        return multilevel_roi_align(
            list(features), rois, list(strides), output_size=output_size,
            sampling_ratio=sampling_ratio, min_level=min_level,
        )
    # whole-level windows require W % 8 == 0 (DMA alignment): pad if needed.
    # The kernel clamps samples to the ORIGINAL width (orig_wls), so padded
    # zero columns are never read by interpolation.
    orig_wls = tuple(f.shape[2] for f in features)
    features = [
        f if f.shape[2] % 8 == 0
        else jnp.pad(f, ((0, 0), (0, 0), (0, -f.shape[2] % 8), (0, 0)))
        for f in features
    ]
    level_shapes = [tuple(f.shape[1:]) for f in features]
    kernel, (wh, ww, _) = _make_kernel(
        level_shapes, orig_wls, tuple(float(s) for s in strides), p,
        sampling_ratio, dtype,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # rois, lvl, bidx
        grid=(b * r,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY) for _ in range(num_levels)],
        out_specs=pl.BlockSpec(
            (1, p, p, c), lambda n, *prefetch: (n, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, wh, ww, c), dtype),  # double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * r, p, p, c), dtype),
        interpret=interpret,
    )(flat_rois, lvl, bidx, *features)
    return out.reshape(b, r, p, p, c)


# ---------------------------------------------------------------------------
# custom-vjp wrapper: Pallas forward, jnp-autodiff backward
# ---------------------------------------------------------------------------


@functools.partial(
    jax.custom_vjp, nondiff_argnames=("strides", "output_size", "sampling_ratio")
)
def roi_align_fused(features, rois, strides=(4, 8, 16, 32), output_size=7,
                    sampling_ratio=2):
    """features: tuple of [B,Hl,Wl,C]. Fast Pallas forward; exact jnp-transpose
    backward (the jnp implementation is numerically identical)."""
    return multilevel_roi_align_pallas(
        list(features), rois, strides=tuple(strides), output_size=output_size,
        sampling_ratio=sampling_ratio,
    )


def _fwd(features, rois, strides, output_size, sampling_ratio):
    out = roi_align_fused(features, rois, strides, output_size, sampling_ratio)
    return out, (features, rois)


def _bwd(strides, output_size, sampling_ratio, res, g):
    features, rois = res
    _, vjp = jax.vjp(
        lambda f: multilevel_roi_align(
            list(f), rois, list(strides), output_size=output_size,
            sampling_ratio=sampling_ratio,
        ),
        features,
    )
    (d_features,) = vjp(g)
    return d_features, jnp.zeros_like(rois)


roi_align_fused.defvjp(_fwd, _bwd)
