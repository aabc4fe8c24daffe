"""Proposal generation: decode -> clip -> top-k -> NMS, all on device.

Replaces the reference's host-side proposal layer
(reference: libs/layers/proposal.py — per image/level: decode RPN deltas,
clip, filter min-size, top-K by score, greedy NMS, top-K again; SURVEY.md
§2.2 "Proposal layer").

Static-shape redesign:
  * per-level candidates are taken with ``lax.top_k`` (pre-NMS K), padded and
    stacked to ``[L, K, ...]`` so one vmapped NMS covers every level;
  * min-size filtering is a validity mask, not a filter;
  * the final cross-level top-K keeps the best ``post_topk`` proposals by
    score with a validity mask. Everything lives inside the jitted step.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from detectron_tpu.ops import boxes as box_ops
from detectron_tpu.ops.nms import nms_padded


class Proposals(NamedTuple):
    boxes: jnp.ndarray  # [B, P, 4]
    scores: jnp.ndarray  # [B, P]
    valid: jnp.ndarray  # [B, P] bool


def generate_proposals(
    scores_per_level: Sequence[jnp.ndarray],  # [B, Nl] objectness logits
    deltas_per_level: Sequence[jnp.ndarray],  # [B, Nl, 4]
    anchors_per_level: Sequence,  # np/jnp [Nl, 4]
    image_hw: jnp.ndarray,  # [B, 2]
    pre_nms_topk: int,
    post_nms_topk: int,
    nms_thresh: float = 0.7,
    min_size: float = 0.0,
    nms_impl: str = "jnp",
    nms_algo: str = "auto",
    exact_topk: bool = False,
    topk_recall: float = 0.99,
) -> Proposals:
    """RPN proposals for a batch. Scores are raw logits (monotonic with
    sigmoid, so no activation needed for ranking; sigmoid applied for the
    returned scores).

    exact_topk=False uses ``lax.approx_max_k`` (recall 0.99) for the
    per-level pre-NMS candidate cut on large levels — exact ``top_k`` over
    P2's ~800k logits is sort-bound on TPU (the same trade RetinaNet's
    candidate selection makes; only tail candidates near the 1000th-place
    cutoff can differ).

    topk_recall sets approx_max_k's recall_target. It sizes the partial-
    reduction buffer the TPU lowering must exact-sort afterwards: at
    k=1000 over P2's 196k logits (bs=1, 1024²), recall 0.99 leaves a
    128000-wide buffer whose aggregate sort is the single most expensive
    postprocess op of the bs=1 program (0.80 ms of 13.0). Measured on the
    chip (DESIGN.md §9): LOWER recall is slower end-to-end (0.95 = 69.4
    vs 79.5 img/s at mask bs=1) — the lowering picks a worse reduction
    shape — so the default stays 0.99; the knob records the A/B."""
    num_levels = len(scores_per_level)

    def per_image(scores_levels, deltas_levels, hw):
        cand_boxes, cand_scores, cand_valid = [], [], []
        for l in range(num_levels):
            s = scores_levels[l]  # [Nl]
            d = deltas_levels[l]  # [Nl, 4]
            anc = jnp.asarray(anchors_per_level[l])
            k = min(pre_nms_topk, s.shape[0])
            if exact_topk or s.shape[0] < 4 * k:
                top_s, top_i = jax.lax.top_k(s, k)
            else:
                top_s, top_i = jax.lax.approx_max_k(
                    s, k, recall_target=topk_recall)
            boxes = box_ops.decode_boxes(d[top_i], anc[top_i])
            boxes = box_ops.clip_boxes(boxes, hw[0], hw[1])
            ok = box_ops.valid_box_mask(boxes, min_size)
            # pad to pre_nms_topk for uniform stacking
            pad = pre_nms_topk - k
            if pad:
                boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
                top_s = jnp.pad(top_s, (0, pad), constant_values=-1e10)
                ok = jnp.pad(ok, (0, pad))
            cand_boxes.append(boxes)
            cand_scores.append(top_s)
            cand_valid.append(ok)
        boxes = jnp.stack(cand_boxes)  # [L, K, 4]
        scores = jnp.stack(cand_scores)  # [L, K]
        valid = jnp.stack(cand_valid)

        # per-level NMS, vmapped over the level axis (Detectron FPN recipe)
        keep_cap = min(post_nms_topk, pre_nms_topk)
        if nms_impl == "pallas":
            from detectron_tpu.ops.nms_pallas import nms_pallas as nms_fn

            run_nms = lambda b, s, v: nms_fn(b, s, nms_thresh, keep_cap,
                                             valid=v)
        else:
            run_nms = lambda b, s, v: nms_padded(b, s, nms_thresh, keep_cap,
                                                 valid=v, algo=nms_algo)
        idx, keep_valid = jax.vmap(run_nms)(boxes, scores, valid)
        kept_boxes = jnp.take_along_axis(boxes, idx[..., None], axis=1)
        kept_scores = jnp.take_along_axis(scores, idx, axis=1)
        kept_scores = jnp.where(keep_valid, kept_scores, -1e10)

        # cross-level top-K by score
        flat_boxes = kept_boxes.reshape(-1, 4)
        flat_scores = kept_scores.reshape(-1)
        top_s, top_i = jax.lax.top_k(flat_scores, post_nms_topk)
        out_valid = top_s > -1e9
        return Proposals(
            boxes=jnp.where(out_valid[:, None], flat_boxes[top_i], 0.0),
            scores=jnp.where(out_valid, jax.nn.sigmoid(top_s), 0.0),
            valid=out_valid,
        )

    return jax.vmap(per_image)(
        [s for s in scores_per_level], [d for d in deltas_per_level], image_hw
    )
