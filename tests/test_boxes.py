"""Golden-value and property tests for box math (SURVEY.md §4 rebuild plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detectron_tpu.ops import boxes as box_ops


def brute_force_iou(boxes, queries, offset=0.0):
    n, k = len(boxes), len(queries)
    out = np.zeros((n, k))
    for i in range(n):
        for j in range(k):
            b, q = boxes[i], queries[j]
            iw = min(b[2], q[2]) - max(b[0], q[0]) + offset
            ih = min(b[3], q[3]) - max(b[1], q[1]) + offset
            if iw > 0 and ih > 0:
                inter = iw * ih
                ua = (
                    (b[2] - b[0] + offset) * (b[3] - b[1] + offset)
                    + (q[2] - q[0] + offset) * (q[3] - q[1] + offset)
                    - inter
                )
                out[i, j] = inter / ua
    return out


@pytest.mark.parametrize("offset", [0.0, 1.0])
def test_bbox_overlaps_vs_bruteforce(offset):
    rng = np.random.RandomState(0)
    xy = rng.uniform(0, 100, size=(40, 2))
    wh = rng.uniform(1, 50, size=(40, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    xy2 = rng.uniform(0, 100, size=(17, 2))
    wh2 = rng.uniform(1, 50, size=(17, 2))
    queries = np.concatenate([xy2, xy2 + wh2], axis=1).astype(np.float32)
    got = np.asarray(box_ops.bbox_overlaps(jnp.asarray(boxes), jnp.asarray(queries), offset))
    want = brute_force_iou(boxes, queries, offset)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_iou_identity_and_disjoint():
    b = jnp.array([[0.0, 0.0, 10.0, 10.0], [20.0, 20.0, 30.0, 30.0]])
    iou = box_ops.bbox_overlaps(b, b)
    np.testing.assert_allclose(np.diag(np.asarray(iou)), [1.0, 1.0], atol=1e-6)
    assert float(iou[0, 1]) == 0.0


@pytest.mark.parametrize("weights", [(1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)])
def test_encode_decode_roundtrip(weights):
    rng = np.random.RandomState(1)
    xy = rng.uniform(0, 200, size=(64, 2))
    wh = rng.uniform(2, 80, size=(64, 2))
    gt = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    axy = rng.uniform(0, 200, size=(64, 2))
    awh = rng.uniform(2, 80, size=(64, 2))
    anchors = np.concatenate([axy, axy + awh], axis=1).astype(np.float32)
    deltas = box_ops.encode_boxes(jnp.asarray(gt), jnp.asarray(anchors), weights)
    back = box_ops.decode_boxes(deltas, jnp.asarray(anchors), weights)
    np.testing.assert_allclose(np.asarray(back), gt, atol=1e-2)


def test_decode_exp_clamp_finite():
    anchors = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    deltas = jnp.array([[0.0, 0.0, 100.0, 100.0]])  # would overflow exp
    out = box_ops.decode_boxes(deltas, anchors)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_clip_and_valid_mask():
    boxes = jnp.array(
        [[-5.0, -5.0, 10.0, 10.0], [90.0, 90.0, 200.0, 150.0], [5.0, 5.0, 5.5, 20.0]]
    )
    clipped = box_ops.clip_boxes(boxes, 100.0, 120.0)
    assert float(clipped[0, 0]) == 0.0 and float(clipped[1, 2]) == 120.0
    mask = box_ops.valid_box_mask(clipped, min_size=1.0)
    assert list(np.asarray(mask)) == [True, True, False]


def test_encode_is_differentiable():
    anchors = jnp.array([[0.0, 0.0, 10.0, 10.0]])

    def loss(d):
        return jnp.sum(box_ops.decode_boxes(d, anchors) ** 2)

    g = jax.grad(loss)(jnp.zeros((1, 4)))
    assert bool(jnp.all(jnp.isfinite(g)))
