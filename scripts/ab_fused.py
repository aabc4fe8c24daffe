"""A/B the Pallas-kernel flags against the honest full-program bench.

Round 1 shipped fused_nms/fused_roi_align off because the fused paths LOST
end-to-end — but that A/B ran on a bench whose mask branch was dead-code
eliminated (see bench.py). This reruns the matrix on the honest program.

Run: python scripts/ab_fused.py [--size 1024] [--batch 2] [--iters 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def measure(cfg, det, params, batch, iters):
    import jax
    import jax.numpy as jnp
    from jax import lax

    def one(i, p, b):
        b = dict(b)
        b["image"] = b["image"] + i.astype(jnp.float32) * 1e-6
        dets, masks = det.predict_fn(p, b)
        acc = dets.scores.sum(dtype=jnp.float32)
        if masks is not None:
            acc = acc + masks.sum(dtype=jnp.float32)
        return acc

    @jax.jit
    def bench_n(p, b, n):
        return lax.fori_loop(0, n, lambda i, acc: acc + one(i, p, b), 0.0)

    float(bench_n(params, batch, 1))
    t0 = time.perf_counter()
    float(bench_n(params, batch, 0))
    roundtrip = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(bench_n(params, batch, iters))
    return max(time.perf_counter() - t0 - roundtrip, 1e-9) / iters * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--model", default="mask_rcnn")
    ap.add_argument("--only", default="",
                    help="run only variants whose name contains this")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp

    from detectron_tpu.config import get_config
    from detectron_tpu.data.synthetic import make_batch
    from detectron_tpu.models.zoo import build_detector

    h = w = args.size
    results = {}
    variants = (
        ("jnp-gather", "off", "off", "gather"),
        ("pallas-nms", "on", "off", "gather"),
        ("pallas-roi", "off", "on", "gather"),
        ("pallas-both", "on", "on", "gather"),
        ("window", "off", "off", "window"),
        ("window+pallas-nms", "on", "off", "window"),
    )
    for name, nms, roi, impl in variants:
        if args.only and args.only not in name:
            continue
        cfg = get_config()
        cfg.model.name = args.model
        cfg.model.dtype = "bfloat16"
        cfg.model.fused_nms = nms
        cfg.model.fused_roi_align = roi
        cfg.roi.align_impl = impl
        det = build_detector(cfg)
        params = det.init(jax.random.key(0), (h, w))
        batch = jax.tree.map(
            jnp.asarray,
            make_batch(np.random.RandomState(0), args.batch, (h, w),
                       cfg.model.num_classes),
        )
        for k in ("gt_boxes", "gt_classes", "gt_masks"):
            batch.pop(k)
        ms = measure(cfg, det, params, batch, args.iters)
        results[name] = round(ms, 2)
        print(f"{name:18s} {ms:7.2f} ms/batch "
              f"({args.batch / ms * 1000:6.1f} img/s)", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
