"""Padded device NMS vs the reference greedy algorithm (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from detectron_tpu.ops import nms as nms_ops


def random_dets(rng, n, span=200.0):
    xy = rng.uniform(0, span, size=(n, 2))
    wh = rng.uniform(5, 80, size=(n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(0, 1, size=(n,)).astype(np.float32)
    return boxes, scores


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("thresh", [0.3, 0.5, 0.7])
def test_padded_nms_matches_reference_greedy(seed, thresh):
    rng = np.random.RandomState(seed)
    boxes, scores = random_dets(rng, 100)
    dets = np.concatenate([boxes, scores[:, None]], axis=1)
    want = nms_ops.nms_numpy(dets, thresh)
    idx, valid = nms_ops.nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), thresh, max_out=100
    )
    got = list(np.asarray(idx)[np.asarray(valid)])
    assert got == want


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("thresh", [0.3, 0.5, 0.7])
@pytest.mark.parametrize("algo", ["tiled", "fixpoint"])
def test_nms_algos_bit_exact_greedy(seed, thresh, algo):
    """Every algo yields the oracle keep set, including at N > NMS_TILE
    (multi-tile / multi-iteration regimes) and chained suppressions."""
    rng = np.random.RandomState(seed + 10)
    boxes, scores = random_dets(rng, 300, span=120.0)  # dense -> deep chains
    dets = np.concatenate([boxes, scores[:, None]], axis=1)
    want = nms_ops.nms_numpy(dets, thresh)[:300]
    idx, valid = nms_ops.nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), thresh, max_out=300,
        algo=algo,
    )
    got = list(np.asarray(idx)[np.asarray(valid)])
    assert got == want


def test_fixpoint_chain_exactness():
    # a>b>c suppression chain: a kills b, b would kill c, but b is dead so
    # greedy KEEPS c — the naive one-pass "suppress by any higher-scored
    # overlapper" gets this wrong; the fixpoint must not.
    boxes = np.array([
        [0.0, 0.0, 10.0, 10.0],   # a (score .9)
        [4.0, 0.0, 14.0, 10.0],   # b overlaps a (score .8)
        [8.0, 0.0, 18.0, 10.0],   # c overlaps b, not a (score .7)
    ], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    idx, valid = nms_ops.nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), 0.3, max_out=3,
        algo="fixpoint",
    )
    got = list(np.asarray(idx)[np.asarray(valid)])
    assert got == [0, 2]


def test_padding_entries_never_selected():
    rng = np.random.RandomState(7)
    boxes, scores = random_dets(rng, 20)
    valid = np.zeros(20, dtype=bool)
    valid[:11] = True
    idx, out_valid = nms_ops.nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_out=20,
        valid=jnp.asarray(valid),
    )
    kept = np.asarray(idx)[np.asarray(out_valid)]
    assert all(k < 11 for k in kept)
    # oracle on the valid subset only
    dets = np.concatenate([boxes, scores[:, None]], axis=1)[:11]
    want = nms_ops.nms_numpy(dets, 0.5)
    assert list(kept) == want


def test_max_out_truncates_in_score_order():
    rng = np.random.RandomState(3)
    # far-apart boxes: nothing suppressed, output = top-5 by score
    boxes = np.array(
        [[i * 1000.0, 0.0, i * 1000.0 + 10, 10.0] for i in range(12)], np.float32
    )
    scores = rng.uniform(0, 1, size=(12,)).astype(np.float32)
    idx, valid = nms_ops.nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 5)
    assert bool(np.all(np.asarray(valid)))
    want = list(np.argsort(-scores)[:5])
    assert list(np.asarray(idx)) == want


def test_max_out_pads_when_larger_than_n():
    boxes = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    scores = jnp.array([0.9])
    idx, valid = nms_ops.nms_padded(boxes, scores, 0.5, max_out=8)
    assert idx.shape == (8,) and valid.shape == (8,)
    assert int(np.asarray(valid).sum()) == 1


def test_class_aware_nms_keeps_cross_class_overlaps():
    # two identical boxes, different classes -> both kept;
    # third box overlaps box 0 with same class -> suppressed.
    boxes = jnp.array(
        [
            [0.0, 0.0, 10.0, 10.0],
            [0.0, 0.0, 10.0, 10.0],
            [1.0, 1.0, 11.0, 11.0],
        ]
    )
    scores = jnp.array([0.9, 0.8, 0.7])
    classes = jnp.array([1, 2, 1])
    idx, valid = nms_ops.class_aware_nms(boxes, scores, classes, 0.5, 3)
    kept = sorted(np.asarray(idx)[np.asarray(valid)].tolist())
    assert kept == [0, 1]


def test_resolve_nms_algo_batch_aware():
    """Round-5: `model.nms_algo=auto` resolves per-batch — fixpoint at
    bs<=2 (measured bs=1 71.6->88.3 img/s on v5e; DESIGN.md §9), the
    existing tiled/loop auto at larger batches; explicit settings pass
    through untouched."""
    from detectron_tpu.config import get_config
    from detectron_tpu.models.faster_rcnn import resolve_nms_algo

    cfg = get_config()
    assert resolve_nms_algo(cfg, 1) == "fixpoint"
    assert resolve_nms_algo(cfg, 2) == "fixpoint"
    assert resolve_nms_algo(cfg, 4) == "auto"
    assert resolve_nms_algo(cfg, 48) == "auto"
    # inference-only: the cited A/Bs are eval programs (train candidate
    # counts were never measured), so train keeps the plain auto
    assert resolve_nms_algo(cfg, 1, train=True) == "auto"
    cfg.model.nms_algo = "tiled"
    assert resolve_nms_algo(cfg, 1) == "tiled"
    cfg.model.nms_algo = "fixpoint"
    assert resolve_nms_algo(cfg, 48) == "fixpoint"
