"""Pallas TPU kernel for greedy NMS.

The production-path replacement for the reference's CUDA NMS kernel
(reference: libs/nms/nms_kernel.cu — 64-box tiles, per-pair IoU, 64-bit
suppression bitmask scanned on the host). TPU redesign, no host roundtrip:

  * candidates arrive score-sorted (jax.lax.top_k upstream);
  * the grid walks 128-box tiles **sequentially** (TPU grid semantics), with
    the running keep-mask in a VMEM scratch that persists across tiles;
  * tile j is first suppressed against every earlier tile's kept boxes with
    vectorized [T, T] IoU blocks (VPU work, no materialized N x N matrix);
  * the within-tile greedy recurrence is **statically unrolled** (T vector
    ops with static indices — no dynamic scalar reads, Mosaic-friendly);
  * the jnp reference implementation (ops/nms.py) is the exact-semantics
    oracle; tests assert bit-equality of keep sets.

Complexity O(N^2 / T) vector ops over VMEM-resident data vs the jnp
version's N sequential HBM-row updates — ~10-30x faster at RPN sizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _iou_block(a, b, offset: float):
    """IoU between row-tiles a [T,4] and b [T,4] -> [T,T] (a rows x b cols)."""
    ax1, ay1, ax2, ay2 = a[:, 0], a[:, 1], a[:, 2], a[:, 3]
    bx1, by1, bx2, by2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    ix1 = jnp.maximum(ax1[:, None], bx1[None, :])
    iy1 = jnp.maximum(ay1[:, None], by1[None, :])
    ix2 = jnp.minimum(ax2[:, None], bx2[None, :])
    iy2 = jnp.minimum(ay2[:, None], by2[None, :])
    iw = jnp.maximum(ix2 - ix1 + offset, 0.0)
    ih = jnp.maximum(iy2 - iy1 + offset, 0.0)
    inter = iw * ih
    area_a = jnp.maximum(ax2 - ax1 + offset, 0.0) * jnp.maximum(ay2 - ay1 + offset, 0.0)
    area_b = jnp.maximum(bx2 - bx1 + offset, 0.0) * jnp.maximum(by2 - by1 + offset, 0.0)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-8)


def _nms_kernel(boxes_ref, valid_ref, keep_ref, *, thresh: float, offset: float,
                n_tiles: int):
    """Grid dim 0 = tile index (sequential on TPU). keep_ref: [n_tiles*T]
    float32 accumulated output (also serves as cross-tile state)."""
    j = pl.program_id(0)
    t = TILE
    bj = boxes_ref[pl.ds(j * t, t), :]  # [T, 4]
    vj = valid_ref[0, pl.ds(j * t, t)]  # [T]

    # suppression by earlier tiles' kept boxes. Static loop bound (Mosaic
    # cannot legalize grid-dependent scf.for bounds); tiles p >= j are
    # masked out — their keep slots are not yet written.
    def prev_tile(p, sup_f):
        bp = boxes_ref[pl.ds(p * t, t), :]
        kp = keep_ref[0, pl.ds(p * t, t)]  # finalized keeps of tile p
        iou = _iou_block(bp, bj, offset)  # [T(p), T(j)]
        # f32 reshape then compare: Mosaic can't reshape 1-bit vectors;
        # loop carry is f32 for the same reason.
        hit = (iou > thresh) & (kp[:, None] > 0.0) & (p < j)
        return jnp.maximum(sup_f, jnp.any(hit, axis=0).astype(jnp.float32))

    suppressed = jax.lax.fori_loop(
        0, n_tiles, prev_tile, jnp.zeros((t,), jnp.float32)
    )

    keep = jnp.where(vj > 0.0, 1.0 - suppressed, 0.0)
    iou_jj = _iou_block(bj, bj, offset)  # [T, T]
    idx = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)[:, 0]
    # statically unrolled greedy within the tile (score order = row order).
    # float arithmetic throughout: Mosaic can't extract bool scalars.
    for i in range(t):
        k_i = keep[i]  # f32 scalar: 1 if box i survives
        sup = (iou_jj[i] > thresh) & (idx > i)
        keep = keep * jnp.where(sup, 1.0 - k_i, 1.0)
    keep_ref[0, pl.ds(j * t, t)] = keep


@functools.partial(
    jax.jit, static_argnames=("iou_threshold", "max_out", "offset", "interpret")
)
def nms_pallas(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    valid: jnp.ndarray | None = None,
    offset: float = 0.0,
    interpret: bool = False,
):
    """Drop-in replacement for ops.nms.nms_padded (same contract/semantics).

    boxes [N,4], scores [N] -> (indices [max_out], valid [max_out]).
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    neg_inf = -1e10
    masked = jnp.where(valid, scores, neg_inf)
    order_scores, order = jax.lax.top_k(masked, n)
    sboxes = boxes[order]
    svalid = order_scores > neg_inf / 2

    n_pad = ((n + TILE - 1) // TILE) * TILE
    pad = n_pad - n
    sboxes_p = jnp.pad(sboxes, ((0, pad), (0, 0)))
    svalid_p = jnp.pad(svalid.astype(jnp.float32), (0, pad))[None, :]

    keep = pl.pallas_call(
        functools.partial(_nms_kernel, thresh=iou_threshold, offset=offset,
                          n_tiles=n_pad // TILE),
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        interpret=interpret,
    )(sboxes_p, svalid_p)[0, :n]

    kept_scores = jnp.where(keep > 0.0, order_scores, neg_inf)
    top_scores, top_pos = jax.lax.top_k(kept_scores, min(max_out, n))
    out_valid = top_scores > neg_inf / 2
    out_idx = jnp.where(out_valid, order[top_pos], 0)
    if max_out > n:
        extra = max_out - n
        out_idx = jnp.concatenate([out_idx, jnp.zeros((extra,), out_idx.dtype)])
        out_valid = jnp.concatenate([out_valid, jnp.zeros((extra,), bool)])
    return out_idx.astype(jnp.int32), out_valid
