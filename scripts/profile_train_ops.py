"""Op-level breakdown of the train step via jax.profiler + ProfileData.

The stage profiler (profile_stages.py) attributes time to pipeline stages;
this one attributes it to individual XLA ops on the device timeline, to
answer "WHERE inside the 110 ms backbone+fpn stage does the time go" —
conv kernels vs layout transposes vs fusions vs DMA stalls.

Run: python scripts/profile_train_ops.py [--batch 8] [--size 1024]
     [--model mask_rcnn] [--mode train|infer] [--set k=v ...]
Writes the raw trace under /tmp/jaxtrace and prints the top-40 ops by
total device time, grouped by a normalized op name.
"""

import argparse
import collections
import glob
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--model", default="mask_rcnn")
    ap.add_argument("--mode", default="train", choices=("train", "infer"))
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--set", dest="overrides", nargs="*", default=[])
    ap.add_argument("--trace-dir", default="/tmp/jaxtrace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from detectron_tpu.config import cfg_from_list, get_config
    from detectron_tpu.data.synthetic import make_batch
    from detectron_tpu.models.zoo import build_detector

    cfg = get_config()
    cfg.model.name = args.model
    cfg.model.dtype = "bfloat16"
    if args.overrides:
        cfg_from_list(args.overrides, cfg)
    h = w = args.size
    det = build_detector(cfg)
    params = det.init(jax.random.key(0), (h, w))
    batch = jax.tree.map(
        jnp.asarray,
        make_batch(np.random.RandomState(0), args.batch, (h, w),
                   cfg.model.num_classes),
    )

    if args.mode == "train":
        from detectron_tpu.train.state import apply_gradients, create_train_state

        state, tx, _ = create_train_state(cfg, params)
        key = jax.random.key(42)

        @jax.jit
        def step(st, i):
            k = jax.random.fold_in(key, i)
            (total, _), grads = jax.value_and_grad(
                lambda p: det.loss_fn(p, batch, k), has_aux=True
            )(st.params)
            return apply_gradients(st, grads, tx), total

        state, _ = step(state, 0)  # compile + warm
        jax.block_until_ready(state.params)
        jax.profiler.start_trace(args.trace_dir)
        for i in range(1, 1 + args.steps):
            state, loss = step(state, i)
        jax.block_until_ready(loss)
        jax.profiler.stop_trace()
    else:
        ibatch = {k: v for k, v in batch.items()
                  if k not in ("gt_boxes", "gt_classes", "gt_masks")}

        @jax.jit
        def pred(p, b):
            return det.predict_fn(p, b)

        out = pred(params, ibatch)
        jax.block_until_ready(out)
        jax.profiler.start_trace(args.trace_dir)
        for _ in range(args.steps):
            out = pred(params, ibatch)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()

    # ---- parse the xplane trace ----
    from jax.profiler import ProfileData

    paths = sorted(glob.glob(
        os.path.join(args.trace_dir, "**", "*.xplane.pb"), recursive=True))
    assert paths, f"no trace written under {args.trace_dir}"
    pd = ProfileData.from_file(paths[-1])

    per_op = collections.Counter()
    per_cat = collections.Counter()
    total = 0.0
    for plane in pd.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        for line in plane.lines:
            # XLA op lines carry per-op events; steps/modules lines duplicate
            if line.name not in ("XLA Ops", "Ops"):
                continue
            for ev in line.events:
                dur = ev.duration_ns / 1e6 / args.steps  # ms per step
                name = ev.name
                # normalize: strip fusion numbering, keep the op kind + a hint
                base = re.sub(r"\.\d+$", "", name)
                per_op[base] += dur
                kind = base.split(".")[0].split("(")[0]
                per_cat[kind] += dur
                total += dur
    print(f"\ndevice op time: {total:.1f} ms/step over {args.steps} steps")
    print("\n== by category ==")
    for k, v in per_cat.most_common(15):
        print(f"{v:9.3f} ms  {100*v/max(total,1e-9):5.1f}%  {k}")
    print("\n== top ops ==")
    for k, v in per_op.most_common(40):
        print(f"{v:9.3f} ms  {100*v/max(total,1e-9):5.1f}%  {k[:110]}")


if __name__ == "__main__":
    main()
