"""Crowded-scene bound for RetinaNet's merged pre-NMS cap (VERDICT r4 item 6).

``configs/retinanet_fast.yaml`` sets ``retinanet.merged_pre_nms_topk=2000``
for a ~2.5x shorter greedy-NMS chain; the config comment admits the cap is
only provably mAP-neutral on sparse scenes. This fixture constructs the
dense regime where it must fail — and measures by how much:

  * 40 "hot" objects (P4/P5/P6 sized) each lighting up 81 anchors above
    the 0.05 score floor — as a trained dense detector does for salient
    objects — whose candidates alone fill the merged top-2000;
  * 300 "cool" objects (P3 sized, scores 0.1-0.45) whose candidates all
    rank below every hot candidate.

With the cap, the cool objects are deleted BEFORE NMS ever gets to dedup
the hot duplicates; without it, NMS keeps all 340. Measured (2026-08-19):
maxDets=100 AP 0.294 -> 0.119 (-0.18), AR100 0.292 -> 0.118;
maxDets=400 AP 0.983 -> 0.119 (-0.86). This is the bound cited in
config/defaults.py — the cap stays opt-in.

Box deltas are exact encodings of the gt boxes, so every activated anchor
decodes onto its object and the evaluator sees a clean PR curve.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detectron_tpu.config import get_config
from detectron_tpu.eval import evaluate_coco
from detectron_tpu.models.retinanet import (
    RETINA_STRIDES, retinanet_anchor_generator, retinanet_inference,
)
from detectron_tpu.ops import boxes as box_ops

H = W = 512
A = 9  # 3 ratios x 3 octaves


def _cfg(cap: int, detections_per_image: int = 100):
    cfg = get_config()
    cfg.model.name = "retinanet"
    cfg.model.num_classes = 2  # 1 fg class
    cfg.retinanet.exact_topk = True  # determinism for the A/B
    cfg.retinanet.merged_pre_nms_topk = cap
    cfg.test.detections_per_image = detections_per_image
    return cfg


def _dense_scene():
    """Craft per-level head outputs + the gt boxes they encode.

    Returns (outputs, anchors_per_level, gt_boxes [G,4]).
    outputs: per level (cls_logits [1,Hl,Wl,A*1], box_deltas [1,Hl,Wl,A*4]).
    """
    cfg = _cfg(0)
    anchors = retinanet_anchor_generator(cfg).grid_anchors((H, W))
    rng = np.random.RandomState(0)

    level_shapes = [(-(-H // s), -(-W // s)) for s in RETINA_STRIDES]
    logits = [np.full((hl * wl * A,), -8.0, np.float32)
              for hl, wl in level_shapes]
    deltas = [np.zeros((hl * wl * A, 4), np.float32)
              for hl, wl in level_shapes]
    gt = []

    def activate(level, box, score, cells, slots, dup_logit=None):
        """Set the given (cell, anchor-slot) entries of `level` to encode
        `box`; the first entry is the primary (logit(score)), the rest are
        duplicates (all decode onto `box`). Duplicates sit at `dup_logit`
        (+- small jitter) when given, else 0.3 logits below the primary."""
        hl, wl = level_shapes[level]
        stride = RETINA_STRIDES[level]
        cy = int((box[1] + box[3]) / 2 / stride)
        cx = int((box[0] + box[2]) / 2 / stride)
        logit = float(np.log(score / (1.0 - score)))
        first = True
        for dy, dx in cells:
            y, x = cy + dy, cx + dx
            if not (0 <= y < hl and 0 <= x < wl):
                continue
            for a in slots:
                idx = (y * wl + x) * A + a
                if first:
                    logits[level][idx] = logit
                elif dup_logit is not None:
                    logits[level][idx] = dup_logit + 0.1 * rng.rand()
                else:
                    logits[level][idx] = logit - 0.3
                deltas[level][idx] = np.asarray(
                    box_ops.encode_boxes(
                        jnp.asarray(box)[None], anchors[level][idx][None]
                    )
                )[0]
                first = False

    # hot objects: 20 @P4 (64 px) + 16 @P5 (120 px) + 4 @P6 (240 px),
    # scores 0.7-0.95, each lighting a 3x3-cell x 9-slot neighborhood
    # (81 candidates) — as a trained dense detector does for salient
    # objects. Duplicate logits sit in a band (0.3-0.4, score ~0.58)
    # strictly ABOVE every cool candidate and strictly BELOW every hot
    # primary: the per-level top-1000 then always keeps hot primaries,
    # and after it the P4+P5+P6 hot candidates alone (1000+1000+324)
    # overfill the merged top-2000, so the cap deletes every cool
    # candidate before NMS can dedup the hot duplicates.
    hot_cells = [(0, 0)] + [(dy, dx) for dy in (-1, 0, 1)
                            for dx in (-1, 0, 1) if (dy, dx) != (0, 0)]
    for i in range(20):
        cx, cy = 56 + 100 * (i % 5), 56 + 100 * (i // 5)
        box = np.array([cx - 32, cy - 32, cx + 32, cy + 32], np.float32)
        gt.append(box)
        activate(1, box, 0.7 + 0.25 * rng.rand(), hot_cells, range(A),
                 dup_logit=0.3)
    for i in range(16):
        cx, cy = 64 + 128 * (i % 4), 64 + 128 * (i // 4)
        box = np.array([cx - 60, cy - 60, cx + 60, cy + 60], np.float32)
        gt.append(box)
        activate(2, box, 0.7 + 0.25 * rng.rand(), hot_cells, range(A),
                 dup_logit=0.3)
    for i in range(4):
        cx, cy = 128 + 256 * (i % 2), 128 + 256 * (i // 2)
        box = np.array([cx - 120, cy - 120, cx + 120, cy + 120], np.float32)
        gt.append(box)
        activate(3, box, 0.7 + 0.25 * rng.rand(), hot_cells, range(A),
                 dup_logit=0.3)
    # cool objects: 300 @P3 (32 px), scores 0.1-0.45, 3 candidates each —
    # every one of their logits ranks below every hot candidate
    order = rng.permutation(18 * 18)[:300]
    for p in order:
        i, j = int(p) % 18, int(p) // 18
        cx, cy = 14 + 28 * i, 14 + 28 * j
        box = np.array([cx - 16, cy - 16, cx + 16, cy + 16], np.float32)
        gt.append(box)
        activate(0, box, 0.1 + 0.35 * rng.rand(), [(0, 0)], range(3))

    outputs = []
    for lvl, (hl, wl) in enumerate(level_shapes):
        outputs.append((
            jnp.asarray(logits[lvl].reshape(1, hl, wl, A)),
            jnp.asarray(deltas[lvl].reshape(1, hl, wl, A * 4)),
        ))
    return outputs, anchors, np.stack(gt)


def _run(outputs, anchors, cap: int, dpi: int):
    cfg = _cfg(cap, dpi)
    dets = jax.jit(
        lambda o: retinanet_inference(
            o, anchors, jnp.asarray([[H, W]], jnp.float32), cfg)
    )(outputs)
    v = np.asarray(dets.valid[0])
    return {
        "boxes": np.asarray(dets.boxes[0])[v],
        "scores": np.asarray(dets.scores[0])[v],
        "classes": np.asarray(dets.classes[0])[v],
    }


@pytest.mark.slow
def test_merged_pre_nms_cap_damage_on_dense_scene():
    outputs, anchors, gt = _dense_scene()
    gts = [{
        "boxes": gt,
        "classes": np.ones(len(gt), np.int32),
        "ignore": np.zeros(len(gt), bool),
    }]

    def ap(cap, dpi):
        res = evaluate_coco([dict(g) for g in gts],
                            [_run(outputs, anchors, cap, dpi)],
                            num_classes=2, max_dets=(1, 10, dpi))
        return res

    # sanity of the crafting: uncapped with a large det budget recovers
    # essentially every object (AP ~ 1)
    full = ap(0, 400)
    assert full["AP50"] > 0.95, full
    assert full["AR400"] > 0.95, full

    # protocol-standard maxDets=100
    r0 = ap(0, 100)
    r2000 = ap(2000, 100)
    # the capped run must not be BETTER; and the measured damage is real
    # (documented in config/defaults.py — update the comment if this moves)
    delta_ap = r0["AP"] - r2000["AP"]
    delta_ar = r0["AR100"] - r2000["AR100"]
    print(f"\nmaxDets=100: AP {r0['AP']:.4f} -> {r2000['AP']:.4f} "
          f"(delta {delta_ap:.4f}); AR100 {r0['AR100']:.4f} -> "
          f"{r2000['AR100']:.4f} (delta {delta_ar:.4f})")
    assert delta_ap > 0.02, (r0, r2000)

    # full-recall view (maxDets=400): the cap's true deletion damage
    f2000 = ap(2000, 400)
    delta_full = full["AP"] - f2000["AP"]
    print(f"maxDets=400: AP {full['AP']:.4f} -> {f2000['AP']:.4f} "
          f"(delta {delta_full:.4f})")
    assert delta_full > 0.3, (full, f2000)

    # and the capped run keeps every HOT object: the damage is precisely
    # the deleted cool tail, not NMS misbehavior
    hot_gt = gt[:40]
    capped = _run(outputs, anchors, 2000, 400)
    iou = np.asarray(box_ops.bbox_overlaps(jnp.asarray(capped["boxes"]),
                                           jnp.asarray(hot_gt)))
    assert (iou.max(axis=0) > 0.9).all()
