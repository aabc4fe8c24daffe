"""Pallas NMS kernel vs the jnp/numpy oracles (interpret mode on CPU;
the same kernel runs compiled on TPU — exercised by bench/perf scripts)."""

import jax.numpy as jnp
import numpy as np
import pytest

from detectron_tpu.ops.nms import nms_numpy, nms_padded
from detectron_tpu.ops.nms_pallas import nms_pallas


def random_dets(rng, n, span=500.0):
    xy = rng.uniform(0, span, size=(n, 2))
    wh = rng.uniform(5, 120, size=(n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.uniform(0, 1, size=(n,)).astype(np.float32)
    return jnp.asarray(boxes), jnp.asarray(scores)


@pytest.mark.parametrize("n", [50, 200, 1000])
@pytest.mark.parametrize("thresh", [0.3, 0.5, 0.7])
def test_matches_jnp_oracle(n, thresh):
    boxes, scores = random_dets(np.random.RandomState(n), n)
    i1, v1 = nms_padded(boxes, scores, thresh, n)
    i2, v2 = nms_pallas(boxes, scores, thresh, n, interpret=True)
    assert list(np.asarray(i1)[np.asarray(v1)]) == list(np.asarray(i2)[np.asarray(v2)])


def test_matches_reference_greedy_numpy():
    rng = np.random.RandomState(7)
    boxes, scores = random_dets(rng, 300)
    dets = np.concatenate([np.asarray(boxes), np.asarray(scores)[:, None]], 1)
    want = nms_numpy(dets, 0.5)
    idx, valid = nms_pallas(boxes, scores, 0.5, 300, interpret=True)
    assert list(np.asarray(idx)[np.asarray(valid)]) == want


def test_validity_mask_and_max_out():
    rng = np.random.RandomState(3)
    boxes, scores = random_dets(rng, 256)
    valid = jnp.asarray(rng.uniform(0, 1, 256) > 0.5)
    i1, v1 = nms_padded(boxes, scores, 0.5, 40, valid=valid)
    i2, v2 = nms_pallas(boxes, scores, 0.5, 40, valid=valid, interpret=True)
    assert i2.shape == (40,)
    assert list(np.asarray(i1)[np.asarray(v1)]) == list(np.asarray(i2)[np.asarray(v2)])


def test_non_tile_multiple_sizes():
    # N not a multiple of the 128 tile exercises the padding path
    for n in (1, 127, 129, 383):
        boxes, scores = random_dets(np.random.RandomState(n), n)
        i1, v1 = nms_padded(boxes, scores, 0.6, n)
        i2, v2 = nms_pallas(boxes, scores, 0.6, n, interpret=True)
        assert list(np.asarray(i1)[np.asarray(v1)]) == list(
            np.asarray(i2)[np.asarray(v2)]
        ), n
