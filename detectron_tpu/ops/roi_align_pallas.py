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

The backward is a Pallas kernel too (multilevel_roi_align_pallas_bwd):
d_window = Wy^T @ d_out @ Wx per RoI — the transpose of the forward's
matmuls — accumulated into the level gradients by sequential-grid
read-modify-write window DMAs (the TPU answer to the CUDA atomicAdd
scatter). Both directions fall back to the jnp implementation when the
kernel's shape preconditions don't hold.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from detectron_tpu.ops.roi_align import (
    DEFAULT_MAX_SPAN, assign_fpn_levels, multilevel_roi_align)

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
    # are unbounded). Larger levels: the span-aware level assignment
    # (assign_fpn_levels(max_span=DEFAULT_MAX_SPAN)) bounds every RoI's
    # span to 28x36 cells at its assigned level, so the 64-cell window is
    # exact for ALL box shapes (the 32x40 XLA-windowed path uses the same
    # bound; the two paths route identically and stay bit-comparable).
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
            # rois arrive TRANSPOSED [4, N]: a [N, 4] scalar-prefetch
            # array lane-pads 4 -> 128 in SMEM (2 MB at N=4096, over the
            # 1 MB SMEM budget); [4, N] pads only sublanes (4 -> 8)
            fx1 = rois_ref[0, m] * scale
            fy1 = rois_ref[1, m] * scale
            fw = jnp.maximum(rois_ref[2, m] * scale - fx1, 1.0)
            fh = jnp.maximum(rois_ref[3, m] * scale - fy1, 1.0)
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
    lvl = assign_fpn_levels(flat_rois, num_levels, min_level,
                            max_span=DEFAULT_MAX_SPAN).astype(jnp.int32)
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
        in_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in range(num_levels)],
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
    )(flat_rois.T, lvl, bidx, *features)
    return out.reshape(b, r, p, p, c)


# ---------------------------------------------------------------------------
# Pallas backward: scatter-add of bilinear gradients (SURVEY.md §7 hard
# part #1). The CUDA reference uses atomicAdd per sample (reference:
# roi_align_backward_cuda in libs/roi_align/src/roi_align_kernel.cu); the
# TPU grid is sequential, so each program read-modify-writes its RoI's
# window instead: d_window = Wy^T @ d_out @ Wx (the exact transpose of the
# forward's separable interpolation matmuls), accumulated into the level
# gradient with a window DMA round-trip. No atomics, no races.
# ---------------------------------------------------------------------------


def _bwd_windows(level_shapes, max_span):
    """Per-level backward DMA window extents (see _make_bwd_kernel notes)."""
    mh, mw = max_span
    wh_req = int(np.ceil(mh)) + 4
    ww_req = int(np.ceil(mw)) + 10
    ww_req += -ww_req % 8  # keep lane-dim slices (8, 128)-tile friendly
    return [
        (min(h, wh_req), min(w, ww_req))
        for (h, w, _) in level_shapes[:-1]
    ] + [level_shapes[-1][:2]]


def _make_bwd_kernel(level_shapes, orig_wls, strides, pool, ratio, out_dtype,
                     max_span=DEFAULT_MAX_SPAN, kbatch=1,
                     matmul_order="sep"):
    num_levels = len(level_shapes)
    # Window extents are derived from the ROUTING bound, not vice versa:
    # at any non-coarsest level the assignment promotes spans to <= max_span
    # cells, so gradient support relative to the window origin is at most
    #   y: (fy1 - y0 < 2) + span + 1 interp cell          -> mh + 4
    #   x: the above + up to 7 more from the floor-to-8 DMA alignment of
    #      x0 (the forward paths don't floor, so +8 slack alone was NOT
    #      enough: a span-35.9 RoI with floor(fx1)-1 == 7 (mod 8) sampled
    #      past a 40-cell window and clamped -> wrong-cell gradients)
    #                                                     -> mw + 10
    # The COARSEST level is always used whole (top-clamped spans are
    # unbounded; the caller guards top <= 48): limit-clipping to the true
    # level size keeps every sample inside a whole-level window.
    wins = _bwd_windows(level_shapes, max_span)
    c = level_shapes[0][2]
    max_wh = max(w[0] for w in wins)
    max_ww = max(w[1] for w in wins)

    def kernel(rois_ref, lvl_ref, bidx_ref, *refs):
        g_ref = refs[0]  # [kbatch, pool, pool, c] VMEM block
        # refs[1 : 1+L] are the zero-init inputs; the OUTPUT refs follow
        # (aliased to the same buffers) — all RMW goes through the outputs
        dfeat_refs = refs[1 + num_levels : 1 + 2 * num_levels]
        win_scratch = refs[1 + 2 * num_levels]  # [2, wh, ww, C] double buffer
        meta = refs[2 + 2 * num_levels]  # SMEM [8] i32: prev window rect
        sems = refs[3 + 2 * num_levels]  # DMA sems [2] (read, write)
        n = pl.program_id(0)
        n_total = pl.num_programs(0)

        @pl.when(n == 0)
        def _():
            meta[4] = 0  # no previous window

        def drain_prev(cond, slot):
            """Wait the previous RoI's window write-back. The DMA wait
            needs the original descriptor's byte count, which depends on
            the PREVIOUS RoI's (static per-level) window size — reconstruct
            it from the SMEM metadata, branching over the level."""
            for l2 in range(num_levels):
                p_h, p_w = wins[l2]

                @pl.when(cond & (meta[1] == l2))
                def _():
                    # the stored x0 was floored to 8 before the write; the
                    # SMEM round-trip loses that fact — re-annotate so
                    # Mosaic can prove the lane-tiling divisibility
                    px0 = pl.multiple_of((meta[3] // 8) * 8, 8)
                    pregion = dfeat_refs[l2].at[
                        meta[0], pl.ds(meta[2], p_h), pl.ds(px0, p_w), :
                    ]
                    psrc = win_scratch.at[
                        1 - slot, pl.ds(0, p_h), pl.ds(0, p_w), :
                    ]
                    pltpu.make_async_copy(psrc, pregion, sems.at[1]).wait()

        def window_geom(m, l):
            hl, wl, _ = level_shapes[l]
            win_h, win_w = wins[l]
            scale = 1.0 / strides[l]
            # rois arrive TRANSPOSED [4, N]: a [N, 4] scalar-prefetch
            # array lane-pads 4 -> 128 in SMEM (2 MB at N=4096, over the
            # 1 MB SMEM budget); [4, N] pads only sublanes (4 -> 8)
            fx1 = rois_ref[0, m] * scale
            fy1 = rois_ref[1, m] * scale
            fw = jnp.maximum(rois_ref[2, m] * scale - fx1, 1.0)
            fh = jnp.maximum(rois_ref[3, m] * scale - fy1, 1.0)
            y0 = jnp.clip(jnp.floor(fy1).astype(jnp.int32) - 1, 0, hl - win_h)
            x0 = jnp.clip(jnp.floor(fx1).astype(jnp.int32) - 1, 0, wl - win_w)
            x0 = pl.multiple_of((x0 // 8) * 8, 8)
            return fx1, fy1, fw, fh, y0, x0

        def process_roi(m, k, slot, last):
            """One RoI's RMW. m: global index; k: row in the g block;
            slot: static scratch parity; last: final RoI of the grid."""
            for l in range(num_levels):
                hl, wl, _ = level_shapes[l]
                wl_clamp = orig_wls[l]
                win_h, win_w = wins[l]

                @pl.when(lvl_ref[m] == l)
                def _():
                    fx1, fy1, fw, fh, y0, x0 = window_geom(m, l)
                    # Software pipeline with hazard detection: the previous
                    # RoI's window write-back is still in flight. It only
                    # has to land before OUR read if the two windows alias
                    # (same image, same level, rectangles intersect) — rare
                    # for typical RoI batches, so read(m) + the matmuls
                    # usually overlap write(m-1). A conflicting write must
                    # be same image AND same level (so its dims equal this
                    # branch's static win_h/win_w).
                    pending = meta[4] == 1
                    hazard = (
                        pending
                        & (meta[0] == bidx_ref[m])
                        & (meta[1] == l)
                        & (y0 < meta[2] + win_h) & (meta[2] < y0 + win_h)
                        & (x0 < meta[3] + win_w) & (meta[3] < x0 + win_w)
                    )
                    drain_prev(hazard, slot)

                    region = dfeat_refs[l].at[
                        bidx_ref[m], pl.ds(y0, win_h), pl.ds(x0, win_w), :
                    ]
                    dst = win_scratch.at[
                        slot, pl.ds(0, win_h), pl.ds(0, win_w), :
                    ]
                    read = pltpu.make_async_copy(region, dst, sems.at[0])
                    read.start()
                    if matmul_order == "xla":
                        # d_window was precomputed OUTSIDE the kernel by
                        # batched XLA dot_generals (full-MXU; see the
                        # wrapper) — the block pipeline streams it in and
                        # this body is a pure DMA read-add-write, no
                        # matmuls, no interpolation-matrix VPU work.
                        d_win = g_ref[0, pl.ds(0, win_h), pl.ds(0, win_w), :
                                      ].astype(jnp.float32)
                        read.wait()
                        acc = win_scratch[
                            slot, pl.ds(0, win_h), pl.ds(0, win_w), :
                        ]
                        win_scratch[
                            slot, pl.ds(0, win_h), pl.ds(0, win_w), :
                        ] = (acc.astype(jnp.float32) + d_win).astype(out_dtype)
                        drain_prev(pending & ~hazard, slot)
                        write = pltpu.make_async_copy(dst, region, sems.at[1])
                        write.start()
                        meta[0] = bidx_ref[m]
                        meta[1] = l
                        meta[2] = y0
                        meta[3] = x0
                        meta[4] = 1
                        if last is not None:
                            @pl.when(last)
                            def _():
                                write.wait()
                        return
                    wy = _interp_matrix(fy1, fh, y0, win_h, hl, pool, ratio)
                    wx = _interp_matrix(fx1, fw, x0, win_w, wl_clamp, pool,
                                        ratio)
                    g = g_ref[k].astype(jnp.float32)  # [pool, pool, c]
                    # dtype-dependent precision (Mosaic supports only
                    # DEFAULT/HIGHEST in-kernel): bf16 features train with
                    # single-pass matmuls — the ~1e-2 relative error on the
                    # scatter-add gradient sits inside the bf16 cotangent
                    # quantization itself; HIGHEST (6-pass) is reserved for
                    # true-f32 features where the kernel must match the f32
                    # jnp VJP to 1e-3 (scripts/tpu_smoke.py).
                    prec = (jax.lax.Precision.HIGHEST
                            if out_dtype == jnp.float32
                            else jax.lax.Precision.DEFAULT)
                    if matmul_order == "noT":
                        # contract q FIRST, then p — the product comes out
                        # [win_h, win_w, c] directly, skipping the final
                        # sublane transpose (A/B candidate; measured in
                        # scripts/bench_roialign_bwd.py)
                        # u[x, p, ch] = sum_q wx[q, x] g[p, q, ch]
                        u = jax.lax.dot_general(
                            wx, g,
                            dimension_numbers=(((0,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec,
                        )  # [win_w, pool, c]
                        # d_win[y, x, ch] = sum_p wy[p, y] u[x, p, ch]
                        d_win = jax.lax.dot_general(
                            wy, u,
                            dimension_numbers=(((0,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec,
                        )  # [win_h, win_w, c]
                    else:
                        # t[y, q, ch] = sum_p wy[p, y] g[p, q, ch]
                        t = jnp.dot(
                            wy.T, g.reshape(pool, pool * c),
                            preferred_element_type=jnp.float32,
                            precision=prec,
                        ).reshape(win_h, pool, c)
                        # d_win[x, y, ch] = sum_q wx[q, x] t[y, q, ch] —
                        # contracting so C stays the LANE dim: the (x, y)
                        # swap below touches only sublane-major dims
                        # (cheap), unlike a (c, x) minor transpose which
                        # blew the VMEM stack
                        d_win = jax.lax.dot_general(
                            wx, t,
                            dimension_numbers=(((0,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=prec,
                        )  # [win_w, win_h, c]
                        d_win = jnp.transpose(d_win, (1, 0, 2))
                    read.wait()
                    acc = win_scratch[
                        slot, pl.ds(0, win_h), pl.ds(0, win_w), :
                    ]
                    win_scratch[slot, pl.ds(0, win_h), pl.ds(0, win_w), :] = (
                        acc.astype(jnp.float32) + d_win
                    ).astype(out_dtype)

                    # drain the previous write before reusing its semaphore
                    # (exactly one wait per outstanding write: either the
                    # hazard wait above or this one)
                    drain_prev(pending & ~hazard, slot)

                    write = pltpu.make_async_copy(dst, region, sems.at[1])
                    write.start()
                    meta[0] = bidx_ref[m]
                    meta[1] = l
                    meta[2] = y0
                    meta[3] = x0
                    meta[4] = 1

                    if last is not None:
                        # final RoI: its write must land before kernel exit
                        @pl.when(last)
                        def _():
                            write.wait()

        # kbatch RoIs per program amortize the Mosaic grid-loop overhead
        # (measured ~6 us/RoI at kbatch=1, ~1.6 us of which is DMA). The
        # scratch-parity slot must ALTERNATE between consecutive RoIs
        # (a read must not target the buffer an in-flight write sources):
        # static k % 2 for EVEN kbatch, dynamic n % 2 for kbatch == 1.
        assert kbatch == 1 or kbatch % 2 == 0
        for k in range(kbatch):
            m = n * kbatch + k if kbatch > 1 else n
            slot = (k % 2) if kbatch > 1 else jax.lax.rem(n, 2)
            process_roi(m, k, slot,
                        last=(n == n_total - 1) if k == kbatch - 1 else None)

    return kernel, (max_wh, max_ww, c)


@functools.partial(
    jax.jit,
    static_argnames=(
        "strides", "output_size", "sampling_ratio", "min_level", "interpret",
        "window", "window_w", "matmul_order",
    ),
)
def multilevel_roi_align_pallas_bwd(
    g: jnp.ndarray,  # [B, R, P, P, C] upstream gradient
    features: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    strides: Sequence[int] = (4, 8, 16, 32),
    output_size: int = 7,
    sampling_ratio: int = 2,
    min_level: int | None = None,
    interpret: bool = False,
    window: int = WINDOW,
    window_w: int = 0,
    matmul_order: str = "sep",
):
    """d(multilevel_roi_align)/d(features) as a Pallas kernel.

    matmul_order: "sep" (default, in-kernel Wy^T@g then wx·t), "noT"
    (in-kernel, transpose-free contraction order), or "xla" (precompute
    every RoI's d_window with batched XLA dot_generals and stream the
    blocks through a matmul-free read-add-write kernel — trades one
    [B·R, wh, ww, C] HBM tensor for full-MXU interpolation matmuls).

    `window` (+ optional asymmetric `window_w`) is the ROUTING window of
    the forward being differentiated: RoIs are assigned levels with
    max_span = (window-4, (window_w or window+8)-4), exactly as
    multilevel_roi_align_windowed(window=...) does (and, at the default
    32, as the Pallas forward / DEFAULT_MAX_SPAN paths do). The kernel's
    DMA window extents are derived from that span internally. Forward and
    backward MUST route identically or gradients land on the wrong level.

    Returns per-level [B, Hl, Wl, C] gradients (same dtypes as features).
    Falls back to the jnp VJP under the same conditions as the forward.
    """
    num_levels = len(features)
    if min_level is None:
        min_level = int(np.log2(strides[0]))
    b, r = rois.shape[:2]
    c = features[0].shape[-1]
    p = output_size
    dtype = features[0].dtype

    top_h, top_w = features[-1].shape[1:3]
    # resolve EXACTLY like the windowed forward (incl. window<=0 auto mode)
    # so fwd/bwd assign RoIs to identical FPN levels
    from detectron_tpu.ops.roi_align import resolve_window

    rwin_h, rwin_w = resolve_window(window, window_w, top_h, top_w)
    max_span = (float(rwin_h - 4), float(rwin_w - 4))
    on_tpu = jax.default_backend() == "tpu" or interpret
    if not on_tpu or top_h > 48 or top_w > 48 or c % 128 != 0:
        out, vjp = jax.vjp(
            lambda f: multilevel_roi_align(
                list(f), rois, list(strides), output_size=output_size,
                sampling_ratio=sampling_ratio, min_level=min_level,
                max_span=max_span,
            ),
            tuple(features),
        )
        # the jnp forward accumulates in f32 regardless of feature dtype;
        # match the cotangent to its output and the results to the inputs
        d = vjp(g.astype(out.dtype))[0]
        return tuple(x.astype(f.dtype) for x, f in zip(d, features))

    flat_rois = rois.reshape(b * r, 4)
    lvl = assign_fpn_levels(flat_rois, num_levels, min_level,
                            max_span=max_span).astype(jnp.int32)
    bidx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)

    orig_wls = tuple(f.shape[2] for f in features)
    padded_shapes = [
        (f.shape[0], f.shape[1], f.shape[2] + (-f.shape[2] % 8), f.shape[3])
        for f in features
    ]
    level_shapes = [s[1:] for s in padded_shapes]
    # kbatch > 1 unrolls several RoIs per grid program. MEASURED LOSS at
    # kbatch=4 (bs=8 train step 189 -> 215 ms): the grid-loop overhead it
    # amortizes is smaller than the cost of the 4x-unrolled kernel body
    # (scalar-core/branch pressure). Keep 1; the knob documents the result.
    kbatch = 1
    kernel, (wh, ww, _) = _make_bwd_kernel(
        level_shapes, orig_wls, tuple(float(s) for s in strides), p,
        sampling_ratio, dtype, max_span=max_span, kbatch=kbatch,
        matmul_order=matmul_order,
    )

    if matmul_order == "xla":
        # Precompute every RoI's d_window with BATCHED dot_generals (full
        # MXU utilization — the in-kernel matmuls are K=pool=7 slivers),
        # leaving the kernel a pure DMA read-add-write pipeline. Costs one
        # [B·R, wh, ww, C] HBM tensor (the backward twin of the windowed
        # forward's window tensor).
        first_arg = _precompute_dwin(
            g.reshape(b * r, p, p, c), flat_rois, lvl, level_shapes,
            orig_wls, _bwd_windows(level_shapes, max_span),
            tuple(float(s) for s in strides), p, sampling_ratio, dtype,
            wh, ww,
        )
        first_spec = pl.BlockSpec(
            (1, wh, ww, c), lambda n, *prefetch: (n, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        first_arg = g.reshape(b * r, p, p, c)
        first_spec = pl.BlockSpec(
            (kbatch, p, p, c), lambda n, *prefetch: (n, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    zeros = [jnp.zeros(s, dtype) for s in padded_shapes]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # rois, lvl, bidx
        grid=(b * r // kbatch,),
        in_specs=[
            first_spec,
        ] + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(num_levels)],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY) for _ in range(num_levels)
        ],
        scratch_shapes=[
            pltpu.VMEM((2, wh, ww, c), dtype),
            pltpu.SMEM((8,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(s, dtype) for s in padded_shapes],
        # accumulate in place into the zero-initialized buffers
        input_output_aliases={4 + i: i for i in range(num_levels)},
        interpret=interpret,
    )(flat_rois.T, lvl, bidx, first_arg, *zeros)
    return tuple(
        o[:, :, :w0, :] if o.shape[2] != w0 else o
        for o, w0 in zip(outs, orig_wls)
    )


def _precompute_dwin(g, flat_rois, lvl, level_shapes, orig_wls, wins,
                     strides, pool, ratio, dtype, max_wh, max_ww):
    """[N, max_wh, max_ww, C] per-RoI window gradients, batched in XLA.

    d_win[r] = Wy_r^T @ g_r @ Wx_r with geometry IDENTICAL to the kernel's
    window_geom (incl. the floor-to-8 x origin), so the kernel can add each
    block to its DMA window verbatim. Rows/cols beyond a level's (win_h,
    win_w) get zero interpolation weight by construction (routing bounds the
    sampling span), so the shared max-extent buffer stays exact.
    """
    from detectron_tpu.ops.roi_align import _interp_weights

    hs_i = jnp.asarray([s[0] for s in level_shapes], jnp.int32)[lvl]
    ws_i = jnp.asarray([s[1] for s in level_shapes], jnp.int32)[lvl]
    hl_f = jnp.asarray([float(s[0]) for s in level_shapes])[lvl]
    wl_f = jnp.asarray([float(w) for w in orig_wls])[lvl]
    win_h = jnp.asarray([w[0] for w in wins], jnp.int32)[lvl]
    win_w = jnp.asarray([w[1] for w in wins], jnp.int32)[lvl]
    scale = jnp.asarray([1.0 / s for s in strides], jnp.float32)[lvl]
    fx1 = flat_rois[:, 0] * scale
    fy1 = flat_rois[:, 1] * scale
    fw = jnp.maximum(flat_rois[:, 2] * scale - fx1, 1.0)
    fh = jnp.maximum(flat_rois[:, 3] * scale - fy1, 1.0)
    y0 = jnp.clip(jnp.floor(fy1).astype(jnp.int32) - 1, 0, hs_i - win_h)
    x0 = jnp.clip(jnp.floor(fx1).astype(jnp.int32) - 1, 0, ws_i - win_w)
    x0 = (x0 // 8) * 8
    wy = _interp_weights(fy1, fh, y0, max_wh, hl_f, pool, ratio)  # [N, P, wh]
    wx = _interp_weights(fx1, fw, x0, max_ww, wl_f, pool, ratio)  # [N, P, ww]
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    gf = g.astype(jnp.float32)
    # u[r, x, p, ch] = sum_q wx[r, q, x] g[r, p, q, ch]
    u = jax.lax.dot_general(
        wx, gf, dimension_numbers=(((1,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec,
    )  # [N, ww, P, C]
    # d_win[r, y, x, ch] = sum_p wy[r, p, y] u[r, x, p, ch]
    d_win = jax.lax.dot_general(
        wy, u, dimension_numbers=(((1,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec,
    )  # [N, wh, ww, C]
    return d_win.astype(dtype)


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
    d_features = multilevel_roi_align_pallas_bwd(
        g, list(features), rois, strides=tuple(strides),
        output_size=output_size, sampling_ratio=sampling_ratio,
    )
    return tuple(d_features), jnp.zeros_like(rois)


roi_align_fused.defvjp(_fwd, _bwd)


@functools.partial(
    jax.custom_vjp,
    nondiff_argnames=("strides", "output_size", "sampling_ratio", "window",
                      "chunk", "window_w", "bwd_order", "align_x8"),
)
def roi_align_window_trainable(features, rois, strides=(4, 8, 16, 32),
                               output_size=7, sampling_ratio=2, window=32,
                               chunk=0, window_w=0, bwd_order="sep",
                               align_x8=False):
    """Windowed separable-matmul forward (ops/roi_align.py, the fastest
    inference path) + Pallas scatter-add backward. The windowed forward's
    AUTODIFF backward scatters whole [R, wh, ww, C] windows, which measured
    228 ms/step vs 126 for the gather path — this pairing keeps the fast
    forward and replaces the backward with the sequential-RMW kernel.
    RoIs get zero gradient (reference CUDA RoIAlign semantics; rois are
    stop-gradient-derived in both training heads anyway)."""
    from detectron_tpu.ops.roi_align import multilevel_roi_align_windowed

    return multilevel_roi_align_windowed(
        list(features), rois, list(strides), output_size=output_size,
        sampling_ratio=sampling_ratio, window=window, chunk=chunk,
        window_w=window_w, align_x8=align_x8,
    )


def _wfwd(features, rois, strides, output_size, sampling_ratio, window,
          chunk, window_w, bwd_order, align_x8):
    out = roi_align_window_trainable(features, rois, strides, output_size,
                                     sampling_ratio, window, chunk, window_w,
                                     bwd_order, align_x8)
    return out, (features, rois)


def _wbwd(strides, output_size, sampling_ratio, window, chunk, window_w,
          bwd_order, align_x8, res, g):
    features, rois = res
    # Pass the forward's routing window through so fwd/bwd assign RoIs to
    # IDENTICAL FPN levels for every value of the roi.window/window_w knobs
    # (a hardcoded DEFAULT_MAX_SPAN here silently mis-trained window != 32).
    # align_x8 is gradient-invariant: it only re-bases the forward's gather
    # window; sample positions (and hence d/d_features) depend on rois +
    # routing alone, so the backward kernel needs no alignment awareness.
    d_features = multilevel_roi_align_pallas_bwd(
        g, list(features), rois, strides=tuple(strides),
        output_size=output_size, sampling_ratio=sampling_ratio,
        window=window, window_w=window_w, matmul_order=bwd_order,
    )
    return tuple(d_features), jnp.zeros_like(rois)


roi_align_window_trainable.defvjp(_wfwd, _wbwd)
