#!/usr/bin/env python
"""Evaluation driver.

Equivalent of the reference's ``test.py`` (reference: test.py; SURVEY.md
§3.2): load snapshot -> batched jitted inference over the val split ->
map detections back to original image coords -> COCO/VOC metrics (own
evaluators; pycocotools is unavailable in this image).

Usage:
  python eval.py --config configs/faster_rcnn_r50_fpn_coco.yaml \
      --cfg data.root=/data/coco [--limit 100]
"""

from __future__ import annotations

import argparse
import json
import os


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--cfg", nargs="*", default=[])
    ap.add_argument("--limit", type=int, default=0,
                    help="eval first N images (per host when multi-host)")
    ap.add_argument("--no-restore", action="store_true",
                    help="evaluate randomly initialized weights (smoke)")
    return ap.parse_args()


def merge_across_processes(gts, dts):
    """Gather per-host (gts, dts) shards onto every process (SURVEY.md §5.8:
    eval shards the val split per host exactly like train shards batches).
    Detection payloads are ragged python/numpy/RLE structures, so they ride
    a pickled byte buffer through jax's process_allgather rather than a
    typed collective. No-op single-process."""
    import jax

    if jax.process_count() == 1:
        return gts, dts
    import pickle

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils as mhu

    payload = np.frombuffer(pickle.dumps((gts, dts)), np.uint8)
    sizes = np.asarray(mhu.process_allgather(jnp.asarray(payload.size)))
    buf = np.zeros(int(sizes.max()), np.uint8)
    buf[: payload.size] = payload
    gathered = np.asarray(mhu.process_allgather(jnp.asarray(buf)))
    all_gts, all_dts = [], []
    for row, size in zip(gathered, sizes.reshape(-1)):
        g, d = pickle.loads(row[: int(size)].tobytes())
        all_gts.extend(g)
        all_dts.extend(d)
    return all_gts, all_dts


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from detectron_tpu.config import get_config
    from detectron_tpu.data.loader import Loader, get_dataset
    from detectron_tpu.eval import evaluate_coco, evaluate_voc
    from detectron_tpu.models.mask_rcnn import paste_masks_rle
    from detectron_tpu.models.zoo import build_detector
    from detectron_tpu.parallel import (
        initialize_distributed, make_mesh, make_predict_step, shard_batch,
    )
    from detectron_tpu.train import checkpoint as ckpt

    cfg = get_config(args.config, args.cfg)
    # multi-host: same wiring as train.py (SURVEY.md §5.8) — each host
    # evaluates a disjoint stride of the val split; results gather below
    pidx, pcount = initialize_distributed(
        cfg.parallel.coordinator_address or None,
        cfg.parallel.num_processes or None,
        cfg.parallel.process_id if cfg.parallel.process_id >= 0 else None,
    )
    det = build_detector(cfg)
    params = det.init(jax.random.key(0))
    if cfg.model.weights:
        from detectron_tpu.utils.torch_weights import maybe_load_pretrained

        params = maybe_load_pretrained(cfg, params)
        print(f"initialized backbone from {cfg.model.weights}")
    if not args.no_restore:
        # params-only restore: structure-independent of whatever optax
        # chain the TRAINING invocation used (its train.* knobs need not
        # be repeated on the eval CLI; see checkpoint.restore_params)
        mgr = ckpt.make_manager(cfg.output_dir)
        params, step = ckpt.restore_params(mgr, params)
        if step is not None:
            print(f"restored step {step} from {cfg.output_dir}")

    mesh = make_mesh(cfg.parallel.num_devices)
    predict = make_predict_step(det, mesh)

    ds = get_dataset(cfg, cfg.data.val_split, train=False)
    loader = Loader(ds, cfg, train=False, process_shard=(pidx, pcount))
    gts, dts = [], []
    seen_ids = set()  # loader order is nondeterministic (worker threads) and
    limit = args.limit or len(ds)  # tails are padded by repetition: pair gt

    def consume(ids, orig_hw, batch, dets, masks):
        # fetch one batch's device outputs, then build det/gt records; gt
        # pairs by image id with dedupe, never by arrival order
        boxes = np.asarray(dets.boxes)
        scores = np.asarray(dets.scores)
        classes = np.asarray(dets.classes)
        valid = np.asarray(dets.valid)
        masks_np = np.asarray(masks) if masks is not None else None
        for i in range(len(ids)):
            if len(seen_ids) >= limit:
                break
            image_id = ids[i].item() if hasattr(ids[i], "item") else ids[i]
            if image_id in seen_ids:
                continue  # tail-padding duplicate
            seen_ids.add(image_id)
            # map from resized coords back to original image coords
            scale = batch["image_hw"][i][0] / orig_hw[i][0]
            v = valid[i]
            b = boxes[i] / max(scale, 1e-9)
            d = {
                "boxes": b[v],
                "scores": scores[i][v],
                "classes": classes[i][v],
                "image_id": ids[i],
            }
            hw_i = tuple(int(x) for x in orig_hw[i])
            if masks_np is not None:
                # fused C++ paste+RLE: O(box area) per det, no full canvas
                # (12.6x the dense paste-then-encode path; DESIGN.md)
                d["masks"] = paste_masks_rle(
                    masks_np[i][v], b[v], np.ones(int(v.sum()), bool), hw_i,
                    threshold=cfg.mask.paste_threshold,
                )
            dts.append(d)
            ex = ds.example(ds.index_of(image_id))
            # VOC: evaluate against ALL objects (difficult ones are matched
            # but not counted by evaluate_voc), not the train-filtered set.
            # CityPersons is the exception: evaluate_mr counts every row of
            # "boxes" as a real positive and handles ignore regions via
            # "ignore_boxes" — feeding all_boxes there double-counted
            # ignored pedestrians as misses (MR^-2 = 1/3 on a perfect
            # gt-echo; caught by tests/test_eval_driver_citypersons.py).
            if cfg.data.dataset == "citypersons":
                g_boxes, g_classes = ex["boxes"], ex["classes"]
            else:
                g_boxes = ex.get("all_boxes", ex["boxes"])
                g_classes = ex.get("all_classes", ex["classes"])
            g_ignore = np.zeros(len(g_boxes), bool)
            # annotation (segmentation) areas for pycocotools-exact area
            # bucketing; None for datasets without them (VOC -> box area)
            g_areas = ex.get("areas")
            if g_areas is not None and len(g_areas) != len(g_boxes):
                g_areas = None  # all_boxes superset without aligned areas
            crowd_boxes = ex.get("crowd_boxes")
            if crowd_boxes is not None and len(crowd_boxes):
                # crowd regions absorb detections without counting (COCO rule)
                g_boxes = np.concatenate([g_boxes, crowd_boxes])
                g_classes = np.concatenate([g_classes, ex["crowd_classes"]])
                g_ignore = np.concatenate(
                    [g_ignore, np.ones(len(crowd_boxes), bool)]
                )
                if g_areas is not None:
                    g_areas = np.concatenate([g_areas, ex["crowd_areas"]])
            g = {
                "boxes": g_boxes,
                "classes": g_classes,
                "ignore": g_ignore,
                "areas": g_areas,
                "difficult": ex.get("all_difficult", ex.get("difficult")),
                "ignore_boxes": ex.get("ignore_boxes"),
            }
            if masks_np is not None and ex.get("polygons") is not None:
                # real gts first, then crowd regions as their actual RLE /
                # polygon rasters so the COCO crowd-absorb rule applies to
                # segm eval too (intersection/det-area via each gt's ignore
                # flag set above; reference: pycocotools iscrowd IoU)
                g["masks"] = [
                    ds.segmentation_to_rle(p, hw_i) for p in ex["polygons"]
                ] + [
                    ds.segmentation_to_rle(s, hw_i)
                    for s in ex.get("crowd_segmentations", [])[
                        : len(g_boxes) - len(ex["polygons"])]
                ]
            gts.append(g)

    # One-deep pipeline: dispatch batch k+1's device work BEFORE fetching
    # batch k's outputs, so the device computes the next batch while the
    # host pulls results, pastes masks, and assembles gt records (jax
    # dispatch is async; only the np.asarray calls in consume() block).
    # A/B'd on the chip via scripts/bench_eval_path.py --pipeline:
    # 60.7 -> 83.4 img/s at bs=48 (DESIGN.md §8).
    pending = None
    for batch in loader:
        if pending is not None:
            # consuming `pending` will raise seen_ids to exactly this
            # count, so skip dispatching a batch whose outputs would all
            # be discarded past --limit (advisor r4). Ids normalize the
            # same way consume() stores them — they can be strings
            # (CityPersons/VOC), so no int() here.
            pend_ids = {i.item() if hasattr(i, "item") else i
                        for i in pending[0]}
            if len(seen_ids | pend_ids) >= limit:
                break
        elif len(seen_ids) >= limit:
            break
        ids = batch.pop("_image_id")
        orig_hw = batch.pop("_orig_hw")
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                  if not k.startswith("gt_") or True}
        out = predict(params, shard_batch(jbatch, mesh))
        if pending is not None:
            consume(*pending)
        pending = (ids, orig_hw, batch, *out)
    if pending is not None:
        consume(*pending)

    gts, dts = merge_across_processes(gts, dts)
    if pidx != 0:
        return  # metrics are computed and written once, on process 0

    if cfg.data.dataset == "voc":
        res = evaluate_voc(gts, dts, ds.num_classes,
                           use_07_metric=cfg.data.voc_use_07_metric)
    elif cfg.data.dataset == "citypersons":
        from detectron_tpu.eval.mr_eval import evaluate_mr

        res = evaluate_mr(gts, dts)
    else:
        res = evaluate_coco(gts, dts, cfg.model.num_classes)
        if dts and dts[0].get("masks") is not None and gts[0].get("masks"):
            segm = evaluate_coco(
                gts, dts, cfg.model.num_classes, iou_type="segm"
            )
            res.update({f"segm_{k}": v for k, v in segm.items()
                        if k != "per_class"})
    os.makedirs(cfg.output_dir, exist_ok=True)
    out_path = os.path.join(cfg.output_dir, "eval_results.json")

    def clean(v):  # NaN (e.g. empty area bucket) is not valid strict JSON
        return None if isinstance(v, float) and v != v else v

    with open(out_path, "w") as f:
        json.dump({k: clean(v) for k, v in res.items() if k != "per_class"},
                  f, indent=2)
    print(json.dumps({k: clean(round(v, 4)) for k, v in res.items()
                      if isinstance(v, float)}, indent=2))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
