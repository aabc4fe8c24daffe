"""Stage-by-stage timing of the Mask R-CNN inference pipeline on real TPU.

Times CUMULATIVE pipeline prefixes (each a separate jitted chained-loop
program, same honest methodology as bench.py) so per-stage cost = successive
differences. Drives the perf work: which stage to attack next, and what the
fusion-barrier A/Bs must beat (VERDICT r1 items 1/3/7).

Run: python scripts/profile_stages.py [--size 1024] [--batch 2] [--iters 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--model", default="mask_rcnn",
                    choices=("mask_rcnn", "retinanet"))
    ap.add_argument("--train", action="store_true",
                    help="profile fwd+bwd of cumulative LOSS prefixes "
                         "instead of the inference pipeline")
    ap.add_argument("--set", dest="overrides", nargs="*", default=[],
                    help="dotted cfg overrides, e.g. roi.align_impl=gather")
    ap.add_argument("--cpu", action="store_true",
                    help="run on host CPU (sanity/syntax check; timings "
                         "meaningless)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp
    from jax import lax

    from detectron_tpu.config import get_config
    from detectron_tpu.data.synthetic import make_batch
    from detectron_tpu.models import faster_rcnn as frcnn
    from detectron_tpu.models.zoo import build_detector

    cfg = get_config()
    cfg.model.name = args.model
    cfg.model.dtype = args.dtype
    if args.overrides:
        from detectron_tpu.config import cfg_from_list

        cfg_from_list(args.overrides, cfg)
    h = w = args.size
    det = build_detector(cfg)
    model = det.module
    params = det.init(jax.random.key(0), (h, w))
    batch = make_batch(np.random.RandomState(0), args.batch, (h, w),
                       cfg.model.num_classes)
    images = jnp.asarray(batch["image"])
    image_hw = jnp.asarray(batch["image_hw"])

    if args.train and args.model == "mask_rcnn":
        # Cumulative-prefix fwd+bwd: grad of (rpn losses | +box losses |
        # +mask loss). Successive differences attribute the train step.
        from detectron_tpu.layers.mask_target import crop_gt_masks_batched
        from detectron_tpu.layers.proposal_target import sample_rois

        gen2 = frcnn.rpn_anchor_generator(cfg)
        anchors_pl2 = gen2.grid_anchors((h, w))
        anchors_all = np.concatenate(anchors_pl2, axis=0)
        gt_boxes = jnp.asarray(batch["gt_boxes"])
        gt_classes = jnp.asarray(batch["gt_classes"])
        gt_masks = jnp.asarray(batch["gt_masks"])
        key = jax.random.key(0)

        def loss_upto(p, imgs, upto: int):
            k_tgt, k_smp = jax.random.split(key)
            levels = model.apply(p, imgs, method=model.features)
            scores_pl, deltas_pl = model.apply(p, levels, method=model.rpn)
            ld = frcnn.rpn_losses(scores_pl, deltas_pl, anchors_all,
                                  gt_boxes, gt_classes, k_tgt, cfg)
            if upto >= 2:
                props = frcnn.proposals_from_rpn(
                    [jax.lax.stop_gradient(s) for s in scores_pl],
                    [jax.lax.stop_gradient(d) for d in deltas_pl],
                    anchors_pl2, image_hw, cfg, train=True)
                tgt = sample_rois(
                    props.boxes, props.valid, gt_boxes, gt_classes, k_smp,
                    sample_size=cfg.roi.batch_per_image,
                    positive_fraction=cfg.roi.positive_fraction,
                    positive_iou=cfg.roi.positive_iou,
                    negative_iou_hi=cfg.roi.negative_iou_hi,
                    negative_iou_lo=cfg.roi.negative_iou_lo,
                    box_weights=cfg.roi.bbox_reg_weights)
                cls_logits, reg = model.apply(p, levels, tgt.rois,
                                              method=model.box)
                ld.update(frcnn.frcnn_box_losses(cls_logits, reg, tgt, cfg))
            if upto >= 3:
                cap = max(int(cfg.roi.batch_per_image
                              * cfg.roi.positive_fraction), 1)
                rois_m = tgt.rois[:, :cap]
                mask_logits = model.apply(p, levels, rois_m,
                                          method=model.mask)
                mask_targets = crop_gt_masks_batched(
                    gt_masks, gt_boxes, rois_m, tgt.matched_idx[:, :cap],
                    resolution=cfg.mask.resolution)
                from detectron_tpu.models import losses as L
                b2, s2 = tgt.labels[:, :cap].shape
                ld["loss_mask"] = L.mask_bce_loss(
                    mask_logits.reshape(b2 * s2, *mask_logits.shape[2:]),
                    mask_targets.reshape(b2 * s2, *mask_targets.shape[2:]),
                    tgt.labels[:, :cap].reshape(-1),
                    tgt.box_weights[:, :cap].reshape(-1))
            return sum(jnp.asarray(v, jnp.float32) for v in ld.values())

        names = ["backbone+fpn+rpn_losses (fwd+bwd)",
                 "+proposals+sample+box_losses", "+mask_loss"]
        results = {}
        prev = 0.0
        for upto in range(1, 4):
            @jax.jit
            def bench_n(p, imgs, n, upto=upto):
                def body(i, acc):
                    g = jax.grad(
                        lambda pp: loss_upto(
                            pp, imgs + i.astype(jnp.float32) * 1e-6, upto)
                    )(p)
                    return acc + sum(
                        jnp.sum(x, dtype=jnp.float32)
                        for x in jax.tree.leaves(g))
                return lax.fori_loop(0, n, body, 0.0)

            float(bench_n(params, images, 1))
            t0 = time.perf_counter()
            float(bench_n(params, images, 0))
            roundtrip = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(bench_n(params, images, args.iters))
            dt = (time.perf_counter() - t0 - roundtrip) / args.iters * 1000
            results[names[upto - 1]] = {"cum_ms": round(dt, 2),
                                        "stage_ms": round(dt - prev, 2)}
            prev = dt
            print(f"{names[upto-1]:36s} cum {dt:7.2f} ms   "
                  f"stage {results[names[upto-1]]['stage_ms']:7.2f} ms",
                  flush=True)
        print(json.dumps(results))
        return

    if args.model == "retinanet":
        from detectron_tpu.models import retinanet as retina

        gen = retina.retinanet_anchor_generator(cfg)
        anchors_pl_r = gen.grid_anchors((h, w))
        k = cfg.model.num_classes - 1

        def pipeline(imgs, upto: int):
            # stage 1: backbone+FPN+subnets (one module call); 2: +postprocess
            feats = model.apply(params, imgs)
            if upto == 1:
                return sum(c.sum(dtype=jnp.float32) for c, _ in feats)
            dets = retina.retinanet_inference(feats, anchors_pl_r,
                                              image_hw, cfg)
            return dets.scores.sum(dtype=jnp.float32)

        names = ["backbone+fpn+subnets", "+postprocess(topk+decode+nms)"]
        results = {}
        prev = 0.0
        for upto in range(1, 3):
            @jax.jit
            def bench_n(imgs, n, upto=upto):
                def body(i, acc):
                    return acc + pipeline(
                        imgs + i.astype(jnp.float32) * 1e-6, upto)
                return lax.fori_loop(0, n, body, 0.0)

            float(bench_n(images, 1))
            t0 = time.perf_counter()
            float(bench_n(images, 0))
            roundtrip = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(bench_n(images, args.iters))
            dt = (time.perf_counter() - t0 - roundtrip) / args.iters * 1000
            results[names[upto - 1]] = {"cum_ms": round(dt, 2),
                                        "stage_ms": round(dt - prev, 2)}
            prev = dt
            print(f"{names[upto-1]:32s} cum {dt:7.2f} ms   "
                  f"stage {results[names[upto-1]]['stage_ms']:7.2f} ms",
                  flush=True)
        print(json.dumps(results))
        return

    gen = frcnn.rpn_anchor_generator(cfg)
    anchors_pl = gen.grid_anchors((h, w))

    def pipeline(imgs, upto: int):
        levels = model.apply(params, imgs, method=model.features)
        if upto == 1:
            return sum(l.sum(dtype=jnp.float32) for l in levels)
        scores_pl, deltas_pl = model.apply(params, levels, method=model.rpn)
        if upto == 2:
            return sum(s.sum(dtype=jnp.float32) for s in scores_pl)
        props = frcnn.proposals_from_rpn(
            scores_pl, deltas_pl, anchors_pl, image_hw, cfg, train=False)
        if upto == 3:
            return props.boxes.sum(dtype=jnp.float32)
        cls_logits, reg = model.apply(params, levels, props.boxes,
                                      method=model.box)
        if upto == 4:
            return cls_logits.sum(dtype=jnp.float32)
        dets = frcnn.fastrcnn_inference(cls_logits, reg, props.boxes,
                                        props.valid, image_hw, cfg)
        if upto == 5:
            return dets.scores.sum(dtype=jnp.float32)
        mask_logits = model.apply(params, levels, dets.boxes,
                                  method=model.mask)
        k = jnp.clip(dets.classes - 1, 0, mask_logits.shape[-1] - 1)
        own = jnp.take_along_axis(
            mask_logits, k[:, :, None, None, None].astype(jnp.int32), axis=-1
        )[..., 0]
        return jax.nn.sigmoid(own).sum(dtype=jnp.float32)

    names = ["backbone+fpn", "+rpn_head", "+proposals(topk+nms)",
             "+roialign+box_head", "+cls_nms_postprocess", "+mask_head"]
    results = {}
    prev = 0.0
    for upto in range(1, 7):
        @jax.jit
        def bench_n(imgs, n, upto=upto):
            def body(i, acc):
                return acc + pipeline(
                    imgs + i.astype(jnp.float32) * 1e-6, upto)
            return lax.fori_loop(0, n, body, 0.0)

        float(bench_n(images, 1))  # compile
        t0 = time.perf_counter()
        float(bench_n(images, 0))
        roundtrip = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(bench_n(images, args.iters))
        dt = (time.perf_counter() - t0 - roundtrip) / args.iters * 1000
        results[names[upto - 1]] = {"cum_ms": round(dt, 2),
                                    "stage_ms": round(dt - prev, 2)}
        prev = dt
        print(f"{names[upto-1]:28s} cum {dt:7.2f} ms   "
              f"stage {results[names[upto-1]]['stage_ms']:7.2f} ms",
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
