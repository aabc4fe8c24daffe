"""Pallas RoIAlign kernel vs the jnp oracle (interpret mode on CPU; the
compiled kernel is exercised on TPU by bench/perf scripts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectron_tpu.ops.roi_align import multilevel_roi_align
from detectron_tpu.ops.roi_align_pallas import (
    multilevel_roi_align_pallas,
    roi_align_fused,
)


def make_inputs(b=2, c=128, base=128, seed=0):
    rng = np.random.RandomState(seed)
    feats = [jnp.asarray(rng.randn(b, base >> i, base >> i, c), jnp.float32)
             for i in range(4)]
    rois = np.array(
        [
            [10, 10, 60, 50],
            [0, 0, 200, 180],
            [0, 0, 500, 500],
            [-20, -20, 100, 90],
            [300, 300, 512, 512],
            [5, 5, 6.5, 8],
        ],
        np.float32,
    )
    rois = jnp.asarray(np.stack([rois + 3.0 * i for i in range(b)]))
    return feats, rois


@pytest.mark.parametrize("pool", [7, 14])
def test_matches_oracle_multilevel(pool):
    feats, rois = make_inputs()
    want = multilevel_roi_align(feats, rois, (4, 8, 16, 32), output_size=pool)
    got = multilevel_roi_align_pallas(
        feats, rois, strides=(4, 8, 16, 32), output_size=pool, interpret=True
    )
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=1e-4)


def test_extreme_aspect_rois_are_border_clamped_not_garbage():
    """RoIs beyond the window aspect bound get the documented
    border-replicate approximation: finite, same order of magnitude."""
    feats, _ = make_inputs(b=1)
    rois = jnp.asarray([[[100.0, 0.0, 125.0, 360.0]]])  # 14:1 aspect
    got = multilevel_roi_align_pallas(
        feats, rois, strides=(4, 8, 16, 32), interpret=True
    )
    assert bool(jnp.all(jnp.isfinite(got)))
    assert float(jnp.abs(got).max()) < 10.0


def test_small_levels_fall_back_or_pad():
    # level widths not multiples of 8 exercise the padding path
    rng = np.random.RandomState(1)
    feats = [
        jnp.asarray(rng.randn(1, 42, 42, 32), jnp.float32),
        jnp.asarray(rng.randn(1, 21, 21, 32), jnp.float32),
    ]
    rois = jnp.asarray([[[5.0, 5.0, 100.0, 90.0]]])
    want = multilevel_roi_align(feats, rois, (4, 8), canonical_level=3)
    got = multilevel_roi_align_pallas(
        feats, rois, strides=(4, 8), interpret=True
    )
    # canonical levels differ (pallas wrapper uses default 4) - recompute
    want = multilevel_roi_align(feats, rois, (4, 8))
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=1e-4)


def test_non_mult128_channels_fall_back_to_jnp():
    feats, rois = make_inputs(c=32)
    # C=32 violates the Mosaic reshape constraint -> jnp fallback, exact
    got = multilevel_roi_align_pallas(
        feats, rois, strides=(4, 8, 16, 32), interpret=True
    )
    want = multilevel_roi_align(feats, rois, (4, 8, 16, 32))
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=1e-5)


@pytest.mark.parametrize("pool", [7, 14])
@pytest.mark.parametrize("matmul_order", ["sep", "xla"])
def test_pallas_backward_matches_jnp_vjp(pool, matmul_order):
    """The Pallas backward kernel (window RMW scatter-add) is numerically
    identical to the jnp VJP, including overlapping RoI windows and the
    W-padding slice (interpret mode; c=128 engages the kernel path).
    matmul_order="xla" precomputes d_window outside the kernel with batched
    dot_generals — same numbers, different schedule."""
    from detectron_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas_bwd

    feats, rois = make_inputs(b=2, c=128, base=120)  # W=120: pad path at P4
    g = jnp.asarray(
        np.random.RandomState(3).randn(2, rois.shape[1], pool, pool, 128),
        jnp.float32,
    )
    got = multilevel_roi_align_pallas_bwd(
        g, feats, rois, strides=(4, 8, 16, 32), output_size=pool,
        interpret=True, matmul_order=matmul_order,
    )
    _, vjp = jax.vjp(
        lambda f: multilevel_roi_align(
            list(f), rois, (4, 8, 16, 32), output_size=pool
        ),
        tuple(feats),
    )
    want = vjp(g)[0]
    for a, b in zip(got, want):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_custom_vjp_gradients_match_jnp():
    feats, rois = make_inputs(b=1, c=32, base=64)
    feats = tuple(f[:, : f.shape[1] // 2, : f.shape[2] // 2] for f in feats)

    def loss_pallas(fs):
        return jnp.sum(
            roi_align_fused(fs, rois, (4, 8, 16, 32), 7, 2) ** 2
        )

    def loss_jnp(fs):
        return jnp.sum(
            multilevel_roi_align(list(fs), rois, (4, 8, 16, 32)) ** 2
        )

    g1 = jax.grad(loss_pallas)(feats)
    g2 = jax.grad(loss_jnp)(feats)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("window,window_w",
                         [(16, 0), (32, 0), (28, 36), (-1, 0)])
def test_bwd_routes_levels_like_the_windowed_forward(window, window_w):
    """Regression (round-3 advisor, high): the backward must assign RoIs to
    FPN levels with the SAME window-derived max_span as the forward being
    differentiated. With a hardcoded DEFAULT_MAX_SPAN, window=16 put the
    forward at P3 but all gradient at P2 — silent mis-training for any
    non-default roi.window."""
    from detectron_tpu.ops.roi_align import multilevel_roi_align_windowed
    from detectron_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas_bwd

    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(1, 64 >> i, 64 >> i, 128), jnp.float32)
             for i in range(4)]
    # 60px span = 15 cells at P2: fits (28, 36) but not (12, 20) -> the two
    # spans route this RoI to different levels
    rois = jnp.asarray([[[10.0, 10.0, 70.0, 70.0]]])
    out, vjp = jax.vjp(
        lambda f: multilevel_roi_align_windowed(
            list(f), rois, [4, 8, 16, 32], window=window,
            window_w=window_w),
        tuple(feats),
    )
    want = vjp(jnp.ones_like(out))[0]
    got = multilevel_roi_align_pallas_bwd(
        jnp.ones((1, 1, 7, 7, 128), jnp.float32), feats, rois,
        strides=(4, 8, 16, 32), interpret=True, window=window,
        window_w=window_w,
    )
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_bwd_window_absorbs_x0_alignment_floor():
    """Regression (round 3): the bwd kernel floors x0 to a multiple of 8 for
    DMA alignment; a +8-only x slack let a span-35.9 RoI starting at
    floor(fx1)-1 == 7 (mod 8) sample past the window edge and clamp
    (maxerr ~0.5 on the production window=32 train path). The window width
    now carries +10 slack past the routing span."""
    from detectron_tpu.ops.roi_align import multilevel_roi_align_windowed
    from detectron_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas_bwd

    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(1, 64 >> i, 64 >> i, 128), jnp.float32)
             for i in range(4)]
    # fx1 = 8.5 (x0 floors 7 -> 0), fw = 35.8 cells at P2
    rois = jnp.asarray([[[34.0, 40.0, 177.2, 100.0]]])
    out, vjp = jax.vjp(
        lambda f: multilevel_roi_align_windowed(
            list(f), rois, [4, 8, 16, 32], window=32),
        tuple(feats),
    )
    want = vjp(jnp.ones_like(out))[0]
    got = multilevel_roi_align_pallas_bwd(
        jnp.ones((1, 1, 7, 7, 128), jnp.float32), feats, rois,
        strides=(4, 8, 16, 32), interpret=True, window=32,
    )
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
