"""Time the Pallas RoIAlign backward kernel at production train shapes.

The backward is the train step's top non-conv op (28.9 + 7.1 ms of the
352 ms bs=16 step, DESIGN.md §7) and is per-RoI compute-bound. This
script A/Bs kernel variants at the box-head (7x7, B*R RoIs) and
mask-head (14x14, fg-compacted) shapes on the real chip, standalone —
the pallas_call is already a fusion barrier, so standalone op time is
representative (unlike XLA-path A/Bs, CLAUDE.md).

Run: python scripts/bench_roialign_bwd.py [--batch 16] [--iters 20]
     [--algos sep,noT]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from detectron_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas_bwd


def bench_case(label, b, r, pool, c, base, dtype, iters, algo):
    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(b, base >> i, base >> i, c), dtype)
             for i in range(4)]
    # realistic RoI mix: areas spread across levels like sampled proposals
    sides = rng.uniform(8, 800, size=(b, r, 2)).astype(np.float32)
    xy = rng.uniform(0, 900, size=(b, r, 2)).astype(np.float32)
    rois = jnp.asarray(np.concatenate([xy, xy + sides], axis=-1))
    g = jnp.asarray(rng.randn(b, r, pool, pool, c), dtype)

    def one(i, acc):
        gi = g + i.astype(dtype) * jnp.asarray(1e-6, dtype)
        outs = multilevel_roi_align_pallas_bwd(
            gi, feats, rois, strides=(4, 8, 16, 32), output_size=pool,
            matmul_order=algo)
        return acc + sum(o.sum(dtype=jnp.float32) for o in outs)

    @jax.jit
    def chain(n):
        return jax.lax.fori_loop(0, n, one, 0.0)

    float(chain(1))  # compile + warm
    t0 = time.perf_counter()
    float(chain(0))
    rt = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chain(iters))
    dt = max(time.perf_counter() - t0 - rt, 1e-9)
    ms = 1000 * dt / iters
    us_per_roi = 1e6 * dt / (iters * b * r)
    print(f"{label} algo={algo}: {ms:.2f} ms/call "
          f"({us_per_roi:.2f} us/RoI, {b}x{r} RoIs, pool={pool})")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    # xla = precompute d_win with batched XLA dot_generals; the kernel
    # becomes a pure DMA read-add-write pipeline (VERDICT r2 item 8)
    ap.add_argument("--algos", default="sep,noT,xla")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    print("platform:", jax.devices()[0].platform)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    for algo in args.algos.split(","):
        # box head: R = roi.batch_per_image sampled RoIs, 7x7
        bench_case("box-head", args.batch, 512, 7, 256, 256, dtype,
                   args.iters, algo)
        # mask head: fg-compacted (25% of 512 rounded up), 14x14
        bench_case("mask-head", args.batch, 128, 14, 256, 256, dtype,
                   args.iters, algo)


if __name__ == "__main__":
    main()
