#!/usr/bin/env python
"""Training driver.

Equivalent of the reference's ``python train.py --cfg ... [--restore]``
(reference: train.py; SURVEY.md §2.2 "Train driver" / §3.1): config -> data
loader -> model -> SGD w/ warmup+step decay -> jitted data-parallel step
loop with periodic logging and orbax checkpoints.

Usage:
  python train.py --config configs/retinanet_r50_fpn_coco.yaml \
      --cfg train.max_steps=1000 data.root=/data/coco [--restore]
"""

from __future__ import annotations

import argparse
import os
import time


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="YAML config file")
    ap.add_argument("--cfg", nargs="*", default=[], help="key=value overrides")
    ap.add_argument("--restore", action="store_true",
                    help="resume from the latest checkpoint in output_dir")
    ap.add_argument("--profile", action="store_true",
                    help="capture a jax.profiler trace of steps 10-15")
    return ap.parse_args()


def batch_iterator(cfg, process_shard=(0, 1)):
    """Yields fixed-shape numpy batch dicts (synthetic or real dataset).
    Each host yields its ``batch_size / process_count`` slice of the global
    batch (multi-host data parallelism, SURVEY.md §5.8)."""
    import numpy as np

    pidx, pcount = process_shard
    if cfg.data.dataset == "synthetic":
        from detectron_tpu.data.synthetic import make_batch

        assert cfg.train.batch_size % pcount == 0
        rng = np.random.RandomState(cfg.train.seed * 1000 + pidx)
        while True:
            yield make_batch(
                rng, cfg.train.batch_size // pcount, cfg.data.image_size,
                cfg.model.num_classes, max_gt=cfg.train.max_gt_boxes,
            )
    else:
        from detectron_tpu.data.loader import Loader, get_dataset

        ds = get_dataset(cfg, cfg.data.train_split, train=True)
        yield from Loader(ds, cfg, train=True, seed=cfg.train.seed,
                          process_shard=process_shard)


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from detectron_tpu.config import get_config
    from detectron_tpu.models.zoo import build_detector
    from detectron_tpu.parallel import (
        initialize_distributed, make_mesh, make_train_step, shard_batch,
    )
    from detectron_tpu.train import checkpoint as ckpt
    from detectron_tpu.train.state import create_train_state
    from detectron_tpu.utils import Timer
    from detectron_tpu.utils.metrics import MetricsWriter
    from detectron_tpu.utils.torch_weights import maybe_load_pretrained

    cfg = get_config(args.config, args.cfg)
    # multi-host wiring must happen before any device use
    pidx, pcount = initialize_distributed(
        cfg.parallel.coordinator_address or None,
        cfg.parallel.num_processes or None,
        cfg.parallel.process_id if cfg.parallel.process_id >= 0 else None,
    )
    if cfg.train.debug_nans:
        jax.config.update("jax_debug_nans", True)
    print(f"model={cfg.model.name} backbone={cfg.model.backbone} "
          f"dataset={cfg.data.dataset} devices={jax.device_count()} "
          f"process={pidx}/{pcount}")

    det = build_detector(cfg)
    params = det.init(jax.random.key(cfg.train.seed))
    params = maybe_load_pretrained(cfg, params)
    if cfg.model.weights:
        print(f"initialized backbone from {cfg.model.weights}")
    state, tx, schedule = create_train_state(cfg, params)

    mgr = ckpt.make_manager(cfg.output_dir)
    if args.restore:
        state = ckpt.restore(mgr, state)
        print(f"restored checkpoint at step {int(state.step)}")

    mesh = make_mesh(cfg.parallel.num_devices)
    step_fn = make_train_step(det, tx, mesh)
    key = jax.random.key(cfg.train.seed + 1)

    timer = Timer()
    writer = MetricsWriter(cfg.output_dir)
    data_iter = batch_iterator(cfg, process_shard=(pidx, pcount))
    start = int(state.step)
    t_log = time.perf_counter()
    for step in range(start, cfg.train.max_steps):
        if args.profile and step == start + 10:
            jax.profiler.start_trace(os.path.join(cfg.output_dir, "profile"))
        if args.profile and step == start + 15:
            jax.profiler.stop_trace()
            print(f"profiler trace written to {cfg.output_dir}/profile")
        timer.tic("data")
        batch = shard_batch(
            jax.tree.map(jnp.asarray, next(data_iter)), mesh
        )
        timer.toc("data")
        timer.tic("step")
        state, metrics = step_fn(state, batch, key)
        timer.toc("step")
        if (step + 1) % cfg.train.log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            dt = time.perf_counter() - t_log
            ips = cfg.train.log_every * cfg.train.batch_size / dt
            t_log = time.perf_counter()
            lr = float(schedule(step))
            loss_str = " ".join(f"{k}={v:.4f}" for k, v in sorted(m.items()))
            print(f"step {step + 1}/{cfg.train.max_steps} lr={lr:.5f} "
                  f"{loss_str} ({ips:.1f} img/s) [{timer.summary()}]")
            writer.write(step + 1, {**m, "lr": lr, "img_per_sec": ips})
        if (step + 1) % cfg.train.checkpoint_every == 0:
            ckpt.save(mgr, state)
    ckpt.save(mgr, state)
    mgr.wait_until_finished()
    print(f"done: {int(state.step)} steps, checkpoints in {cfg.output_dir}")


if __name__ == "__main__":
    main()
