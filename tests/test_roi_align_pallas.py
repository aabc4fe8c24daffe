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
def test_pallas_backward_matches_jnp_vjp(pool):
    """The Pallas backward kernel (window RMW scatter-add) is numerically
    identical to the jnp VJP, including overlapping RoI windows and the
    W-padding slice (interpret mode; c=128 engages the kernel path)."""
    from detectron_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas_bwd

    feats, rois = make_inputs(b=2, c=128, base=120)  # W=120: pad path at P4
    g = jnp.asarray(
        np.random.RandomState(3).randn(2, rois.shape[1], pool, pool, 128),
        jnp.float32,
    )
    got = multilevel_roi_align_pallas_bwd(
        g, feats, rois, strides=(4, 8, 16, 32), output_size=pool,
        interpret=True,
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
