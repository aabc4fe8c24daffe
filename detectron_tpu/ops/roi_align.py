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

RoIPool is EXACT reference semantics (round-quantized RoI, +1 extent,
floor/ceil dynamic bin boundaries, empty bins zero): the data-dependent bin
sizes become static shapes via per-RoI windows + bin-membership masks +
separable masked max (``multilevel_roi_pool``); oracle-tested against a
scalar NumPy port of the CUDA kernel's algorithm.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


# Max RoI extent, in feature cells at the assigned level, that the default
# 32x40 interpolation window of the windowed/Pallas RoIAlign paths can hold
# (window minus sampling margins). Shared by ALL multilevel pool entry
# points so every implementation routes RoIs to identical levels.
DEFAULT_MAX_SPAN = (28.0, 36.0)


def assign_fpn_levels(
    rois: jnp.ndarray,
    num_levels: int,
    min_level: int,
    canonical_level: int = 4,
    canonical_scale: float = 224.0,
    max_span: tuple[float, float] | None = None,
) -> jnp.ndarray:
    """Per-RoI pyramid level index in ``[0, num_levels)``.

    rois: [..., 4]. Uses k = floor(k0 + log2(sqrt(wh)/224)) (the FPN paper
    heuristic; reference: libs/layers/assign.py lineage).

    max_span: optional (mh, mw) bound, in feature cells. When set, an RoI is
    promoted to the first level where its height/2^k <= mh AND
    width/2^k <= mw — i.e. where its sampling span fits a fixed
    interpolation window. This is a deliberate TPU-first deviation from the
    pure-area rule: the windowed/Pallas RoIAlign kernels read a static
    per-RoI window, and without the bound an elongated RoI near the top of
    a level's size band overflows it (border-replicate error — worst case
    breaks already at ~1.1:1 aspect, measured ~2.0 abs on ResNet features).
    With the bound every implementation (gather / windowed / Pallas /
    RoIPool) is mutually bit-exact for ALL box shapes: the promoted level's
    span halves per step, and the coarsest level is always used whole.
    """
    w = jnp.maximum(rois[..., 2] - rois[..., 0], 0.0)
    h = jnp.maximum(rois[..., 3] - rois[..., 1], 0.0)
    scale = jnp.sqrt(w * h)
    k = jnp.floor(
        canonical_level + jnp.log2(scale / canonical_scale + 1e-8)
    ).astype(jnp.int32)
    if max_span is not None:
        mh, mw = max_span
        # smallest absolute level whose cells hold the span: k >= log2(h/mh)
        kh = jnp.ceil(jnp.log2(jnp.maximum(h, 1.0) / mh) - 1e-6)
        kw = jnp.ceil(jnp.log2(jnp.maximum(w, 1.0) / mw) - 1e-6)
        k = jnp.maximum(k, jnp.maximum(kh, kw).astype(jnp.int32))
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
    max_span: tuple[float, float] | None = DEFAULT_MAX_SPAN,
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
            rois_i, num_levels, min_level, canonical_level, canonical_scale,
            max_span=max_span,
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


def _interp_weights(lo, extent, offset, win: int, limit, pool: int,
                    ratio: int):
    """Folded bilinear+average interpolation matrices, batched over RoIs.

    lo/extent/offset/limit: [R] per-RoI scalars (offset int32, limit float).
    Returns [R, pool, win] where out = W @ window reproduces Caffe2 RoIAlign
    along one axis (the same construction as the Pallas kernel's
    _interp_matrix, vectorized in jnp).
    """
    r = lo.shape[0]
    bin_size = extent / pool  # [R]
    k = np.arange(pool * ratio)
    pos = jnp.asarray(
        (k // ratio) + ((k % ratio) + 0.5) / ratio, jnp.float32
    )  # [pool*ratio]
    s = lo[:, None] + pos[None, :] * bin_size[:, None]  # [R, pool*ratio]
    inb = (s >= -1.0) & (s <= limit[:, None])
    sc = jnp.clip(s, 0.0, limit[:, None] - 1.0) - offset[:, None].astype(
        jnp.float32
    )
    sc = jnp.clip(sc, 0.0, float(win) - 1.0)  # window-edge replicate
    y = jnp.asarray(np.arange(win), jnp.float32)  # [win]
    w = jnp.maximum(0.0, 1.0 - jnp.abs(y[None, None, :] - sc[:, :, None]))
    w = jnp.where(inb[:, :, None], w, 0.0)  # [R, pool*ratio, win]
    return w.reshape(r, pool, ratio, win).sum(axis=2) / float(ratio)


# auto-chunk (roi.chunk == -1) thresholds, measured on v5e (DESIGN.md §7):
# unchunked while the [B,R,wh,ww,C] window tensor fits comfortably
# (bs<=32 at 1024² stays unchunked — chunking there is neutral), else a
# chunk bounding it to ~4 GB (bs=48 -> 127, inside the 100-150 plateau
# that benched 135 img/s; too-small chunks lose ~10% to scan overhead).
_AUTO_CHUNK_UNCHUNKED_BYTES = 6_500_000_000
_AUTO_CHUNK_TARGET_BYTES = 4_000_000_000


def resolve_window(window, window_w, top_h, top_w):
    """Resolve the interpolation window extents from the knobs + the
    coarsest pooled level's static shape.

    window <= 0 (the cfg default) = AUTO per dim: the measured-best 32,
    raised (8-aligned) to cover the coarsest level so the windowed path
    never falls back to the flat gather — 32x32 at 1024² square, 32x48
    on the 832x1344 landscape bucket, 48x32 portrait (the fallback cost
    2x: 65 vs ~130 img/s, DESIGN.md §7). Explicit ints pass through
    (window_w == 0 with an explicit window keeps the legacy window+8).
    The Pallas backward resolves with THIS SAME function so forward and
    backward route RoIs to identical FPN levels."""
    if window <= 0:
        win_h = max(32, -(-int(top_h) // 8) * 8)
        win_w = window_w if window_w > 0 else max(32, -(-int(top_w) // 8) * 8)
        return win_h, win_w
    return window, (window_w if window_w > 0 else window + 8)


def _resolve_auto_chunk(b, r, win_h, win_w, c, itemsize):
    per_roi = int(win_h) * int(win_w) * int(c) * int(itemsize)
    if b * r * per_roi <= _AUTO_CHUNK_UNCHUNKED_BYTES:
        return 0
    # pick the chunk COUNT first, then split R evenly: a raw byte-target
    # chunk pads R up (R=300 at bs=48 gave chunk=127 -> 3x127=381 rows,
    # 27% wasted work, 129.5 vs 135.1 img/s measured)
    n_chunks = -(b * r * per_roi // -_AUTO_CHUNK_TARGET_BYTES)
    return max(1, -(r // -n_chunks))


def multilevel_roi_align_windowed(
    features: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    strides: Sequence[int],
    output_size: int = 7,
    sampling_ratio: int = 2,
    min_level: int | None = None,
    window: int = 32,
    chunk: int = 0,
    window_w: int = 0,
    align_x8: bool = False,
) -> jnp.ndarray:
    """RoIAlign as windowed separable interpolation MATMULS, pure XLA.

    The same algorithm as the Pallas kernel (ops/roi_align_pallas.py) —
    per-RoI feature window + two folded-bilinear interpolation matrices,
    ``pooled = Wy @ window @ Wx^T`` — but expressed in XLA so there is no
    pallas_call fusion barrier: ONE row-slice gather from the flat level
    table builds [R, wh, ww, C] windows, then two batched MXU matmuls do all
    interpolation+averaging. Replaces ~R*P*P*4 scalar-row gathers with
    R*wh contiguous (ww*C)-sized slices — the four-corner gather was the
    top hot spot and scaled super-linearly in batch (profile in DESIGN.md).

    Exactness: identical to multilevel_roi_align for EVERY box shape — the
    span-aware level assignment (``assign_fpn_levels(max_span=...)``)
    promotes any RoI whose side would overflow the window to a coarser
    level, and the coarsest level must fit entirely (top_h <= window —
    checked; falls back to the gather path otherwise). Oracle-tested in
    tests/test_roi_align.py including elongated band-top boxes.

    chunk > 0 bounds the materialized [B, R, wh, ww, C] window tensor by
    processing RoIs in lax.map chunks of that many per image (a scan, so
    peak memory is one chunk): at bs=48 / R=300 / C=256 the unchunked
    window tensor alone is 9.4 GB — past half of v5e HBM — which is what
    made bs>=48 inference fail to compile (round-2 "padding blowup").
    Exactness is unaffected (per-RoI computation is independent).

    align_x8 widens the gathered window by 8 columns and rounds each
    window's x-start DOWN to a multiple of 8 so every [gw, C] row slice
    starts on an (8,128)-tile boundary of the flat table (level widths and
    offsets are all multiples of 8, so the slice start mod 8 equals
    x0 mod 8). Interpolation weights re-base on the actual start, level
    routing still uses the UNwidened window span, and out-of-level columns
    carry zero weight — bit-exact with align_x8=False for every box
    (asserted in tests/test_roi_align.py). Trades +25% gather bytes for
    tile-aligned DMA starts; keep it a measured knob.

    chunk == -1 (the cfg default) picks automatically from static shapes:
    unchunked while the window tensor stays under 6.5 GB (bs<=32 measured
    best unchunked; chunking bs=32 is throughput-neutral, 132.7 vs 133.1
    img/s), else the smallest EVEN split of R targeting ~4 GB chunks
    (bs=48 -> 100, the measured 135.1 img/s point; an uneven 127 padded
    300->381 RoIs and lost 5.6 img/s; chunk=64 loses 10% to scan
    serialization — v5e measurements in DESIGN.md §7).
    """
    num_levels = len(features)
    if min_level is None:
        min_level = int(np.log2(strides[0]))
    p, s = output_size, sampling_ratio
    b, _, _, c = features[0].shape
    r = rois.shape[1]
    dtype = features[0].dtype

    hs = np.array([f.shape[1] for f in features])
    ws = np.array([f.shape[2] for f in features])
    # window <= 0 = auto from the coarsest level; window_w decouples the
    # x-extent (0 = auto/legacy — see resolve_window). Routing max_span
    # follows BOTH dims so level assignment keeps RoIs inside the window.
    win_h, win_w = resolve_window(window, window_w, hs[-1], ws[-1])
    max_span = (float(win_h - 4), float(win_w - 4))
    # gathered x-extent: +8 alignment slack when align_x8 (see docstring);
    # routing/fallback keep using win_w so level assignment is unchanged
    gw = win_w + 8 if align_x8 else win_w
    if chunk == -1:  # auto: resolve from static shapes (see docstring)
        chunk = _resolve_auto_chunk(b, r, win_h, gw, c,
                                    np.dtype(dtype).itemsize)
    if hs[-1] > win_h or ws[-1] > win_w:
        # coarsest level must fit whole (top-clamped RoI spans are unbounded)
        import warnings

        warnings.warn(
            f"windowed RoIAlign: coarsest level ({hs[-1]}x{ws[-1]}) exceeds "
            f"the {win_h}x{win_w} interpolation window -> falling back to "
            f"the flat-gather path (slower; OOMs at large batch). Use "
            f"roi.window >= {hs[-1]} and roi.window_w >= {ws[-1]} (or 0). "
            "At 1024^2 with P2-P5 pooling the floor is 32x32.",
            stacklevel=2,
        )
        return multilevel_roi_align(
            list(features), rois, list(strides), output_size=output_size,
            sampling_ratio=sampling_ratio, min_level=min_level,
            max_span=max_span,
        )
    offsets = np.concatenate([[0], np.cumsum(hs * ws)[:-1]])
    flat = jnp.concatenate([f.reshape(b, -1, c) for f in features], axis=1)
    # zero tail so end-of-table windows never clamp their slice starts
    # (clamping would shift values away from the positions the weights
    # assume); weights already mask rows/cols outside the true level.
    flat = jnp.pad(flat, ((0, 0), (0, win_h * int(ws.max()) + gw), (0, 0)))

    strides_arr = jnp.asarray(np.array(strides, np.float32))
    hs_f = jnp.asarray(hs.astype(np.float32))
    ws_f = jnp.asarray(ws.astype(np.float32))
    hs_i = jnp.asarray(hs.astype(np.int32))
    ws_i = jnp.asarray(ws.astype(np.int32))
    off_arr = jnp.asarray(offsets.astype(np.int32))

    def per_image(feat_flat, rois_full):  # [Lpad, C], [R, 4]
        if chunk and rois_full.shape[0] > chunk:
            pad = -rois_full.shape[0] % chunk
            rp = jnp.pad(rois_full, ((0, pad), (0, 0)))
            out = jax.lax.map(
                lambda rc: _pool_rois(feat_flat, rc),
                rp.reshape(-1, chunk, 4),
            )
            return out.reshape(-1, p, p, c)[: rois_full.shape[0]]
        return _pool_rois(feat_flat, rois_full)

    def _pool_rois(feat_flat, rois_i):  # [Lpad, C], [Rc, 4]
        lvl = assign_fpn_levels(rois_i, num_levels, min_level,
                                max_span=max_span)
        scale = 1.0 / strides_arr[lvl]
        hl, wl = hs_f[lvl], ws_f[lvl]
        hli, wli = hs_i[lvl], ws_i[lvl]
        off = off_arr[lvl]
        fx1 = rois_i[:, 0] * scale
        fy1 = rois_i[:, 1] * scale
        fw = jnp.maximum(rois_i[:, 2] * scale - fx1, 1.0)
        fh = jnp.maximum(rois_i[:, 3] * scale - fy1, 1.0)
        y0 = jnp.clip(jnp.floor(fy1).astype(jnp.int32) - 1, 0,
                      jnp.maximum(hli - win_h, 0))
        x0 = jnp.clip(jnp.floor(fx1).astype(jnp.int32) - 1, 0,
                      jnp.maximum(wli - gw, 0))
        if align_x8:
            # tile-aligned slice starts: level widths/offsets are multiples
            # of 8, so start % 8 == x0 % 8; the 8-col slack in gw keeps the
            # (unchanged) routed span covered after rounding down
            x0 = (x0 // 8) * 8
        wy = _interp_weights(fy1, fh, y0, win_h, hl, p, s)  # [R, P, wh]
        wx = _interp_weights(fx1, fw, x0, gw, wl, p, s)  # [R, P, gw]

        # window row starts in the flat table: [R, wh]
        row = y0[:, None] + jnp.asarray(np.arange(win_h), jnp.int32)[None, :]
        start = off[:, None] + row * wli[:, None] + x0[:, None]

        def row_slice(st):  # (gw, C) contiguous slice
            return jax.lax.dynamic_slice(feat_flat, (st, 0), (gw, c))

        win = jax.vmap(jax.vmap(row_slice))(start)  # [R, wh, ww, C]
        # NB a "simpler" 1-D formulation (slice (ww*C,) runs off the
        # flattened table) measured 5x SLOWER end-to-end: XLA's 1-D
        # dynamic-slice path loses the (8,128)-tiled 2-D DMA. Keep the 2-D
        # slices and hand the 4-D window straight to dot_general below so
        # any layout fix folds into the matmul instead of a manual
        # reshape+copy (~16 ms/step of pure layout work, profiled).
        if dtype == jnp.float32:
            # Exact path (the oracle contract): TPU f32 matmuls default to
            # ONE bf16 MXU pass (~1e-2 interpolation error, caught on
            # hardware by scripts/tpu_smoke.py) — force 6-pass HIGHEST.
            wy_m, wx_m = wy, wx
            win = win.astype(jnp.float32)
            acc, prec = jnp.float32, jax.lax.Precision.HIGHEST
        else:
            # bf16 production path: native single-pass bf16 matmuls with
            # f32 MXU accumulation, bf16 intermediates. Casting the
            # interpolation weights to bf16 perturbs effective sample
            # positions by ~2^-9 of a cell and the output by ~2e-3
            # relative — the same order as the bf16 feature quantization
            # itself (neutrality vs the f32 oracle is asserted in
            # tests/test_roi_align.py::test_windowed_bf16_close_to_f32).
            # This keeps the [R, P, ww, C] intermediate in bf16: at bs=8 /
            # 512 RoIs the f32 version materialized 1.2 GB + layout
            # copies (~14 ms/step).
            wy_m, wx_m = wy.astype(dtype), wx.astype(dtype)
            acc, prec = dtype, jax.lax.Precision.DEFAULT
        # t[r, p, x, ch] = sum_y wy[r, p, y] win[r, y, x, ch]
        t = jax.lax.dot_general(
            wy_m, win,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=acc,
            precision=prec,
        )  # [R, P, ww, C]
        # out[r, p, q, ch] = sum_x wx[r, q, x] t[r, p, x, ch]
        out = jax.lax.dot_general(
            wx_m, t,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=acc,
            precision=prec,
        )  # [R, Q, P, C] with dims (batch r, q, p, c)
        return jnp.transpose(out, (0, 2, 1, 3)).astype(dtype)

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


def _pool_bin_masks(start, extent, origin, win: int, limit, pool: int):
    """Dynamic-bin membership masks for exact RoIPool, batched over RoIs.

    start/origin: [R] int32 (quantized RoI start cell / window origin);
    extent: [R] float (roi cells, >= 1); limit: [R] int32 level size.
    Returns (mask [R, pool, win] bool, nonempty [R, pool] bool) where
    mask[r, p, j] says window row j of RoI r belongs to output bin p under
    the reference's floor/ceil bin extents.
    """
    bin_size = extent / pool  # [R]
    p = jnp.asarray(np.arange(pool, dtype=np.float32))
    lo = jnp.floor(p[None, :] * bin_size[:, None]).astype(jnp.int32)
    hi = jnp.ceil((p[None, :] + 1.0) * bin_size[:, None]).astype(jnp.int32)
    lo = jnp.clip(lo + start[:, None], 0, limit[:, None])  # [R, pool]
    hi = jnp.clip(hi + start[:, None], 0, limit[:, None])
    g = origin[:, None] + jnp.asarray(np.arange(win, dtype=np.int32))  # [R, win]
    mask = (g[:, None, :] >= lo[:, :, None]) & (g[:, None, :] < hi[:, :, None])
    # "nonempty" = the bin has a cell the window actually COVERS (equals
    # hi > lo whenever the window holds the RoI, which the callers now
    # guarantee; the mask form can never turn a masked max into float32-min)
    return mask, mask.any(axis=2)


def multilevel_roi_pool(
    features: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    strides: Sequence[int],
    output_size: int = 7,
    min_level: int | None = None,
    window: int = 32,
) -> jnp.ndarray:
    """Exact dynamic-bin max RoIPool over an FPN pyramid, static-shape.

    Reference semantics (libs/roi_pooling/src/roi_pooling_kernel.cu,
    py-faster-rcnn lineage): integer-quantized RoI (round), +1 cell extent,
    bin (ph, pw) maxes over feature cells [floor(ph*bh), ceil((ph+1)*bh)) x
    [floor(pw*bw), ceil((pw+1)*bw)) — a *variable*-size bin; empty bins are
    0. The dynamic bins become static shapes the same way the windowed
    RoIAlign does: one row-slice gather builds per-RoI [wh, ww, C] windows
    from the flat level table, then per-bin membership masks + a separable
    masked max (rows, then cols) reproduce the variable-size bin max. RoIs
    spanning more than `window` cells at their assigned level cannot occur:
    the span-aware level assignment (max_span) promotes such RoIs to a
    coarser level, the same routing as the RoIAlign paths.
    """
    num_levels = len(features)
    if min_level is None:
        min_level = int(np.log2(strides[0]))
    pool = output_size
    b, _, _, c = features[0].shape
    r = rois.shape[1]
    dtype = features[0].dtype

    hs = np.array([f.shape[1] for f in features])
    ws = np.array([f.shape[2] for f in features])
    # routing span comes from the REQUESTED window (identical level routing
    # to the RoIAlign paths); the actual window grows to hold the coarsest
    # level whole if needed — top-clamped RoI spans are unbounded there, and
    # a too-small window used to leave nonzero-extent bins with all-false
    # membership masks, emitting float32-min instead of features (advisor
    # round-3 finding: >1024px images at stride 32, or single-level
    # roi_pool on maps larger than the window).
    max_span = (float(window - 4), float(window + 4))
    win_h = max(window, int(hs[-1]))
    win_w = max(window + 8, int(ws[-1]))
    offsets = np.concatenate([[0], np.cumsum(hs * ws)[:-1]])
    flat = jnp.concatenate([f.reshape(b, -1, c) for f in features], axis=1)
    flat = jnp.pad(flat, ((0, 0), (0, win_h * int(ws.max()) + win_w), (0, 0)))

    strides_arr = jnp.asarray(np.array(strides, np.float32))
    hs_i = jnp.asarray(hs.astype(np.int32))
    ws_i = jnp.asarray(ws.astype(np.int32))
    off_arr = jnp.asarray(offsets.astype(np.int32))
    neg = jnp.asarray(np.finfo(np.float32).min, jnp.float32)

    def per_image(feat_flat, rois_i):  # [Lpad, C], [R, 4]
        lvl = assign_fpn_levels(rois_i, num_levels, min_level,
                                max_span=max_span)
        scale = 1.0 / strides_arr[lvl]
        hli, wli = hs_i[lvl], ws_i[lvl]
        off = off_arr[lvl]
        sx = jnp.round(rois_i[:, 0] * scale).astype(jnp.int32)
        sy = jnp.round(rois_i[:, 1] * scale).astype(jnp.int32)
        ex = jnp.round(rois_i[:, 2] * scale).astype(jnp.int32)
        ey = jnp.round(rois_i[:, 3] * scale).astype(jnp.int32)
        rw = jnp.maximum(ex - sx + 1, 1).astype(jnp.float32)
        rh = jnp.maximum(ey - sy + 1, 1).astype(jnp.float32)
        y0 = jnp.clip(sy, 0, jnp.maximum(hli - win_h, 0))
        x0 = jnp.clip(sx, 0, jnp.maximum(wli - win_w, 0))
        my, ney = _pool_bin_masks(sy, rh, y0, win_h, hli, pool)
        mx, nex = _pool_bin_masks(sx, rw, x0, win_w, wli, pool)

        row = y0[:, None] + jnp.asarray(np.arange(win_h), jnp.int32)[None, :]
        start = off[:, None] + row * wli[:, None] + x0[:, None]

        def row_slice(st):  # (ww, C) contiguous slice
            return jax.lax.dynamic_slice(feat_flat, (st, 0), (win_w, c))

        win = jax.vmap(jax.vmap(row_slice))(start)  # [R, wh, ww, C]
        win = win.astype(jnp.float32)
        # separable masked max: rows first (pool passes over the window,
        # each fused by XLA into a single select+reduce), then cols.
        trow = jnp.stack(
            [jnp.max(jnp.where(my[:, p, :, None, None], win, neg), axis=1)
             for p in range(pool)], axis=1)  # [R, P, ww, C]
        out = jnp.stack(
            [jnp.max(jnp.where(mx[:, q, None, :, None], trow, neg), axis=2)
             for q in range(pool)], axis=2)  # [R, P, P, C]
        nonempty = (ney[:, :, None] & nex[:, None, :])[..., None]
        return jnp.where(nonempty, out, 0.0).astype(dtype)

    return jax.vmap(per_image)(flat, rois)


def roi_pool(
    feature: jnp.ndarray,
    rois: jnp.ndarray,
    stride: int,
    output_size: int = 7,
    window: int = 32,
) -> jnp.ndarray:
    """Single-level exact dynamic-bin max RoIPool (reference:
    libs/roi_pooling/src/roi_pooling_kernel.cu). See multilevel_roi_pool."""
    return multilevel_roi_pool(
        [feature], rois, [stride], output_size=output_size, window=window,
    )
