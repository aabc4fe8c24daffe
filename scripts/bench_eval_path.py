#!/usr/bin/env python
"""End-to-end eval-path throughput at the headline config (VERDICT r3 #4).

Measures what eval.py actually does per batch — jitted predict -> device->
host fetch -> fused C++ paste+RLE per image — and reports images/sec for
the detections->RLE stage. This is the honest eval-driver number: the
device->host fetch cannot ack early on the relay (the bytes must arrive),
so a fetch-based loop is real time, unlike block_until_ready here
(CLAUDE.md). The final evaluate_coco() call is O(dataset) once and is
timed separately on fixtures (tests/test_eval*.py).

Random weights give worst-case-ish detection counts (the 100-det/image cap
fills up), so the paste workload is an upper bound on real checkpoints.

  python scripts/bench_eval_path.py [--batch 48] [--iters 6] [--size 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--model", default="mask_rcnn")
    ap.add_argument("--pipeline", action="store_true",
                    help="one-deep pipeline (dispatch k+1 before fetching "
                         "k), matching eval.py's loop")
    ap.add_argument("--depth", type=int, default=1,
                    help="pipeline depth with --pipeline: keep N batches "
                         "in flight (depth 1 = eval.py's loop)")
    # JAX_PLATFORMS env is ignored in this container (sitecustomize pins
    # the plugin); --platform cpu forces CPU before first device use.
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.depth > 1 and not args.pipeline:
        args.pipeline = True  # --depth N implies the pipelined loop (advisor r4)

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache" if args.platform
                                   not in ("cpu",) else ".jax_cache_cpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from detectron_tpu.config import get_config
    from detectron_tpu.data.synthetic import make_batch
    from detectron_tpu.models.mask_rcnn import paste_masks_rle
    from detectron_tpu.models.zoo import build_detector

    cfg = get_config()
    cfg.model.name = args.model
    cfg.model.dtype = "bfloat16"
    h = w = args.size
    det = build_detector(cfg)
    params = det.init(jax.random.key(0), (h, w))
    batch = jax.tree.map(
        jnp.asarray,
        make_batch(np.random.RandomState(0), args.batch, (h, w),
                   cfg.model.num_classes),
    )
    batch = {k: v for k, v in batch.items() if not k.startswith("gt_")}

    jpred = jax.jit(det.predict_fn)

    def fetch_and_paste(dets, masks):
        """Host half of one eval.py iteration: fetch -> paste+RLE."""
        t0 = time.perf_counter()
        boxes = np.asarray(dets.boxes)
        scores = np.asarray(dets.scores)
        valid = np.asarray(dets.valid)
        masks_np = np.asarray(masks) if masks is not None else None
        t_dev = time.perf_counter() - t0
        n_dets = 0
        dts = []
        t0 = time.perf_counter()
        for i in range(args.batch):
            v = valid[i]
            n_dets += int(v.sum())
            d = {"boxes": boxes[i][v], "scores": scores[i][v]}
            if masks_np is not None:
                d["masks"] = paste_masks_rle(
                    masks_np[i][v], boxes[i][v],
                    np.ones(int(v.sum()), bool), (h, w),
                    threshold=cfg.mask.paste_threshold,
                )
            dts.append(d)
        t_host = time.perf_counter() - t0
        return t_dev, t_host, n_dets

    # compile + warm (cold compile can take ~30 min through the relay)
    t0 = time.perf_counter()
    fetch_and_paste(*jpred(params, batch))
    print(f"warmup (incl. compile): {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    dev = host = 0.0
    dets_total = 0
    t_all0 = time.perf_counter()
    if args.pipeline:
        # N-deep pipeline: keep `depth` batches in flight, fetching the
        # oldest once the queue is full (depth 1 = eval.py's loop:
        # dispatch k+1 before fetching k; jax dispatch is async)
        from collections import deque
        pending = deque()
        for _ in range(args.iters):
            pending.append(jpred(params, batch))
            if len(pending) > args.depth:
                t_dev, t_host, n = fetch_and_paste(*pending.popleft())
                dev += t_dev
                host += t_host
                dets_total += n
        while pending:
            t_dev, t_host, n = fetch_and_paste(*pending.popleft())
            dev += t_dev
            host += t_host
            dets_total += n
    else:
        for _ in range(args.iters):
            t_dev, t_host, n = fetch_and_paste(*jpred(params, batch))
            dev += t_dev
            host += t_host
            dets_total += n
    wall = time.perf_counter() - t_all0
    n_img = args.iters * args.batch
    print(json.dumps({
        "metric": f"{args.model} eval-path images/sec "
                  f"(predict+fetch+paste+RLE, bs={args.batch}, {h}x{w}"
                  + (f", pipelined depth={args.depth}" if args.pipeline
                     else "") + ")",
        "value": round(n_img / wall, 2),
        "unit": "images/sec",
        "device_fetch_ms_per_img": round(dev / n_img * 1e3, 2),
        "host_paste_ms_per_img": round(host / n_img * 1e3, 2),
        "mean_dets_per_img": round(dets_total / n_img, 1),
    }))


if __name__ == "__main__":
    main()
