"""Benchmark: Mask R-CNN R-50-FPN COCO-resolution inference throughput.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline (BASELINE.md): the north-star compares against A100 images/sec/chip
for Mask R-CNN R-50-FPN COCO inference. The reference repo's own numbers are
unavailable (empty mount, BASELINE.json.published = {}); we use 45 img/s as
the A100 orientation figure (Detectron2 Mask R-CNN R50-FPN ~0.022 s/im on
A100-class hardware). Target: vs_baseline >= 2.0.

Run: python bench.py [--size 1024] [--batch 8] [--dtype bfloat16] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

A100_BASELINE_IMG_S = 45.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--model", default="mask_rcnn")
    args = ap.parse_args()

    import jax

    # persistent compile cache: the 1024^2 program takes ~30 min to compile
    # cold through the remote-compile relay; warm runs take seconds.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp

    from detectron_tpu.config import get_config
    from detectron_tpu.data.synthetic import make_batch
    from detectron_tpu.models.zoo import build_detector

    cfg = get_config()
    cfg.model.name = args.model
    cfg.model.dtype = args.dtype
    h = w = args.size
    det = build_detector(cfg)
    params = det.init(jax.random.key(0), (h, w))
    if args.dtype == "bfloat16":
        # keep params fp32 (master copy); compute dtype handles casting
        pass
    batch = jax.tree.map(
        jnp.asarray,
        make_batch(np.random.RandomState(0), args.batch, (h, w),
                   cfg.model.num_classes),
    )
    for k in ("gt_boxes", "gt_classes", "gt_masks"):
        batch.pop(k)

    # Timing methodology: on this image the TPU is reached through a relay
    # whose block_until_ready returns early, so host-side loops mis-time.
    # Instead we chain `iters` full forwards inside ONE compiled fori_loop
    # (inputs perturbed per-iteration to defeat CSE/hoisting) and fetch a
    # scalar; device time = total - scalar roundtrip. Verified linear in
    # `iters`.
    from jax import lax

    def one(i, p, b):
        b = dict(b)
        b["image"] = b["image"] + i.astype(jnp.float32) * 1e-6
        dets, _ = det.predict_fn(p, b)
        return dets.scores.sum()

    @jax.jit
    def bench_n(p, b, n):
        return lax.fori_loop(0, n, lambda i, acc: acc + one(i, p, b), 0.0)

    float(bench_n(params, batch, 1))  # compile + warm
    t0 = time.perf_counter()
    float(bench_n(params, batch, 0))
    roundtrip = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(bench_n(params, batch, args.iters))
    dt = max(time.perf_counter() - t0 - roundtrip, 1e-9)
    img_s = args.batch * args.iters / dt

    print(
        json.dumps(
            {
                "metric": f"{args.model} R-50-FPN inference images/sec/chip "
                          f"({h}x{w}, bs={args.batch}, {args.dtype}, "
                          f"{jax.devices()[0].platform})",
                "value": round(img_s, 2),
                "unit": "images/sec",
                "vs_baseline": round(img_s / A100_BASELINE_IMG_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
