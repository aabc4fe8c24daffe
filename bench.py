"""Benchmark: Mask R-CNN R-50-FPN COCO-resolution throughput (infer + train).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N,
   "train_img_s_chip": N, "train_step_ms": N}

Baseline (BASELINE.md): the north-star compares against A100 images/sec/chip
for Mask R-CNN R-50-FPN COCO inference. The reference repo's own numbers are
unavailable (empty mount, BASELINE.json.published = {}); we use 45 img/s as
the A100 orientation figure (Detectron2 Mask R-CNN R50-FPN ~0.022 s/im on
A100-class hardware). Target: vs_baseline >= 2.0. The train metric's A100
orientation is ~20 train img/s/GPU (Detectron2 R50-FPN 1x ~0.4 s/iter at
bs=16 over 8 GPUs, V100; A100 ~1.6x that).

Run: python bench.py [--size 1024] [--batch 8] [--dtype bfloat16]
                     [--iters 20] [--mode both|infer|train] [--model ...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

LAST_GOOD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BENCH_LAST_GOOD.json")

# Exactly one JSON line may reach stdout (the driver parses it). The real
# result and the fallback paths (watchdog deadline, probe exhaustion,
# mid-run exception) race; first emitter wins.
_emit_lock = threading.Lock()
_emitted = False


def _emit(payload: dict) -> bool:
    global _emitted
    with _emit_lock:
        if _emitted:
            return False
        _emitted = True
    print(json.dumps(payload), flush=True)
    return True


def _emit_fallback(reason: str) -> None:
    """Emit the last-good result marked stale, or an explicit error line.

    VERDICT r3 weak #1: when the axon relay is down for hours, bench.py
    must still print a parseable JSON line inside the driver's window —
    rc=124 with no output loses the whole round's perf evidence.
    """
    payload = None
    try:
        with open(LAST_GOOD_PATH) as f:
            payload = json.load(f)
    except (OSError, ValueError):
        payload = None
    if payload is None or "value" not in payload:
        payload = {
            "metric": "mask_rcnn R-50-FPN inference images/sec/chip "
                      "(unavailable)",
            "value": 0.0,
            "unit": "images/sec",
            "vs_baseline": 0.0,
            "error": reason,
        }
    else:
        payload["stale"] = True
        payload["stale_reason"] = reason
    if _emit(payload):
        print(f"bench: fallback emitted ({reason})", file=sys.stderr)


def _save_last_good(out: dict) -> None:
    try:
        rec = dict(out)
        rec["recorded_unix"] = int(time.time())
        with open(LAST_GOOD_PATH, "w") as f:
            json.dump(rec, f, indent=1)
            f.write("\n")
    except OSError as e:  # never let bookkeeping kill the bench
        print(f"bench: could not save last-good: {e}", file=sys.stderr)


def _wait_for_device(budget_s: float) -> bool:
    """Block until the TPU relay answers (or the budget runs out).

    The axon relay goes down for hours at a time (observed r3); if bench.py
    runs during an outage, the very first device contact raises
    ``Unable to initialize backend 'axon': UNAVAILABLE`` and the round
    records no benchmark at all. Probe in a SUBPROCESS (a failed in-process
    backend init is cached by jax for the life of the process) every 60 s
    until the relay answers. All probe chatter goes to stderr — stdout must
    stay the single JSON line.
    """
    deadline = time.monotonic() + budget_s
    attempt = 0
    while True:
        attempt += 1
        # DEVNULL + explicit kill: capture_output would block past the
        # timeout draining pipes inherited by the plugin's helper processes.
        # BENCH_PROBE_CMD lets tests simulate relay outages without a TPU.
        probe = os.environ.get("BENCH_PROBE_CMD")
        cmd = (probe.split() if probe
               else [sys.executable, "-c", "import jax; jax.devices()"])
        proc = subprocess.Popen(
            cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        try:
            rc = proc.wait(timeout=120)
        except subprocess.TimeoutExpired:
            proc.kill()
            rc = -9
        if rc == 0:
            if attempt > 1:
                print(f"bench: device up after {attempt} probes",
                      file=sys.stderr)
            return True
        if time.monotonic() >= deadline:
            print("bench: device probe budget exhausted",
                  file=sys.stderr)
            return False
        delay = min(60.0, max(deadline - time.monotonic(), 0.5))
        print(f"bench: device unavailable (probe {attempt}); retrying in "
              f"{delay:.0f}s", file=sys.stderr)
        time.sleep(delay)

# Per-model A100 orientation figures (BASELINE.md; "from memory,
# unverified" — the reference mount is empty). Train orientation exists
# only for the flagship; other models report raw img/s without a ratio.
A100_BASELINE_IMG_S = {"mask_rcnn": 45.0, "faster_rcnn": 45.0,
                       "retinanet": 37.0}
A100_BASELINE_TRAIN_IMG_S = {"mask_rcnn": 20.0}


def main():
    ap = argparse.ArgumentParser()
    # square int, or "HxW" for the orientation-bucket canvases (e.g.
    # 832x1344 landscape / 1344x832 portrait — two compiled programs)
    ap.add_argument("--size", default="1024")
    # Inference scales with batch now that RoIAlign is windowed-matmul and
    # auto-chunked (bs 8/16/32/48 = 122/128/133/135 img/s; roi.chunk=-1
    # resolves bs=48's 8.8 GB window tensor into three 100-RoI chunks).
    # Train is flat beyond bs=8 (41.4 vs 41.9 at 16, which doubles step
    # latency) -> infer bs=48, train bs=8 are the headlines.
    ap.add_argument("--batch", type=int, default=48)
    # train scaling un-flattened in round 3 (window fix): bs=16 45.4 img/s
    # beats bs=8's 44.9 — headline at 16
    ap.add_argument("--train-batch", type=int, default=16,
                    help="train bench batch (0 = same as --batch)")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--train-iters", type=int, default=8)
    ap.add_argument("--model", default="mask_rcnn")
    ap.add_argument("--mode", default="both",
                    choices=("both", "infer", "train"))
    ap.add_argument("--set", dest="overrides", nargs="*", default=[],
                    help="dotted cfg overrides for A/Bs, e.g. "
                         "model.fused_nms=on roi.align_impl=gather")
    # r3 burned the driver's whole window on a 45-min probe loop; keep the
    # probe budget well inside the ~10-min fallback bar (VERDICT r4 item 1).
    ap.add_argument("--wait-device", type=float,
                    default=float(os.environ.get("BENCH_WAIT_DEVICE_S", 480)),
                    help="seconds to wait for the TPU relay before giving up")
    # Overall watchdog: if the run (compiles included) hasn't printed by
    # this deadline, emit last-good-with-stale and hard-exit. Warm-cache
    # runs finish in ~2 min; only a cold .jax_cache approaches this.
    ap.add_argument("--deadline", type=float,
                    default=float(os.environ.get("BENCH_DEADLINE_S", 2100)),
                    help="hard wall-clock budget before emitting fallback")
    args = ap.parse_args()

    if args.deadline > 0:
        def _watchdog():
            _emit_fallback(f"deadline {args.deadline:.0f}s exceeded")
            sys.stdout.flush()
            os._exit(0)
        t = threading.Timer(args.deadline, _watchdog)
        t.daemon = True
        t.start()

    if args.wait_device > 0 and not _wait_for_device(args.wait_device):
        _emit_fallback("device unavailable (relay outage)")
        return

    import jax

    # persistent compile cache: the 1024^2 program takes ~30 min to compile
    # cold through the remote-compile relay; warm runs take seconds.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp
    from jax import lax

    from detectron_tpu.config import get_config
    from detectron_tpu.data.synthetic import make_batch
    from detectron_tpu.models.zoo import build_detector

    cfg = get_config()
    cfg.model.name = args.model
    cfg.model.dtype = args.dtype
    if args.overrides:
        from detectron_tpu.config import cfg_from_list

        cfg_from_list(args.overrides, cfg)
    if "x" in str(args.size):
        h, w = (int(s) for s in str(args.size).split("x"))
    else:
        h = w = int(args.size)
    bb = {"resnet50": "R-50-FPN", "resnet101": "R-101-FPN"}.get(
        cfg.model.backbone, cfg.model.backbone)
    det = build_detector(cfg)
    params = det.init(jax.random.key(0), (h, w))
    # params stay fp32 (master copy); cfg.model.dtype casts compute to bf16
    train_batch_size = args.train_batch or args.batch
    full_batch = jax.tree.map(
        jnp.asarray,
        make_batch(np.random.RandomState(0), max(args.batch, train_batch_size),
                   (h, w), cfg.model.num_classes),
    )

    # Timing methodology: on this image the TPU is reached through a relay
    # whose block_until_ready returns early, so host-side loops mis-time.
    # Instead we chain `iters` full programs inside ONE compiled fori_loop
    # (inputs perturbed per-iteration to defeat CSE/hoisting) and fetch a
    # scalar; device time = total - scalar roundtrip. Verified linear in
    # `iters`.
    out = {}

    if args.mode in ("both", "infer"):
        batch = {k: v[: args.batch] for k, v in full_batch.items()
                 if k not in ("gt_boxes", "gt_classes", "gt_masks")}

        def one(i, p, b):
            b = dict(b)
            b["image"] = b["image"] + i.astype(jnp.float32) * 1e-6
            dets, masks = det.predict_fn(p, b)
            # consume EVERY output: leaving masks unused lets XLA dead-code
            # the whole mask branch (this silently inflated the round-1
            # number by ~40% — found via scripts/profile_stages.py)
            acc = dets.scores.sum(dtype=jnp.float32)
            if masks is not None:
                acc = acc + masks.sum(dtype=jnp.float32)
            return acc

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
        out.update(
            metric=f"{args.model} {bb} inference images/sec/chip "
                   f"({h}x{w}, bs={args.batch}, {args.dtype}, "
                   f"{jax.devices()[0].platform})",
            value=round(img_s, 2),
            unit="images/sec",
            vs_baseline=round(
                img_s / A100_BASELINE_IMG_S.get(args.model, 45.0), 3),
        )

    if args.mode in ("both", "train"):
        # full fwd+bwd+SGD step chained through the TrainState carry
        # (VERDICT r1 item 4: the train path must be benched, not estimated)
        from detectron_tpu.train.state import apply_gradients, create_train_state

        tbatch = {k: v[:train_batch_size] for k, v in full_batch.items()}
        state, tx, _ = create_train_state(cfg, params)
        key = jax.random.key(42)

        def step(i, st):
            b = dict(tbatch)
            b["image"] = b["image"] + i.astype(jnp.float32) * 1e-6
            k = jax.random.fold_in(key, i)
            (_, _), grads = jax.value_and_grad(
                lambda p: det.loss_fn(p, b, k), has_aux=True
            )(st.params)
            return apply_gradients(st, grads, tx)

        @jax.jit
        def train_n(st, n):
            st = lax.fori_loop(0, n, step, st)
            # consume every param so nothing in the chain is dead code
            return sum(x.sum(dtype=jnp.float32)
                       for x in jax.tree.leaves(st.params))

        def fetch(n):
            return float(train_n(state, n))

        fetch(1)  # compile + warm
        t0 = time.perf_counter()
        fetch(0)
        roundtrip = time.perf_counter() - t0
        t0 = time.perf_counter()
        fetch(args.train_iters)
        dt = max(time.perf_counter() - t0 - roundtrip, 1e-9)
        tr_img_s = train_batch_size * args.train_iters / dt
        out["train_img_s_chip"] = round(tr_img_s, 2)
        out["train_step_ms"] = round(1000 * dt / args.train_iters, 1)
        tb = A100_BASELINE_TRAIN_IMG_S.get(args.model)
        out["train_vs_baseline"] = round(tr_img_s / tb, 3) if tb else None
        if args.mode == "train":
            out.update(
                metric=f"{args.model} {bb} train images/sec/chip "
                       f"({h}x{w}, bs={train_batch_size}, {args.dtype})",
                value=out["train_img_s_chip"],
                unit="images/sec",
                vs_baseline=out["train_vs_baseline"] or 0.0,
            )

    # Only a full headline-config run may refresh the last-good record:
    # an A/B probe at a non-default batch (e.g. --mode infer --batch 64)
    # must never replace the stronger default-config fallback the driver
    # would quote during an outage.
    is_headline = (
        args.mode == "both"
        and not args.overrides
        and args.model == ap.get_default("model")
        and args.batch == ap.get_default("batch")
        and args.train_batch == ap.get_default("train_batch")
        and str(args.size) == str(ap.get_default("size"))
        and args.dtype == ap.get_default("dtype")
        # short --iters probes are too noisy to overwrite the record
        and args.iters == ap.get_default("iters")
        and args.train_iters == ap.get_default("train_iters")
    )
    if is_headline and not out.get("stale"):
        _save_last_good(out)
    _emit(out)


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # noqa: BLE001 — a JSON line must always land
        import traceback

        traceback.print_exc(file=sys.stderr)
        _emit_fallback(f"bench error: {type(e).__name__}: {e}")
        if isinstance(e, KeyboardInterrupt):
            raise
