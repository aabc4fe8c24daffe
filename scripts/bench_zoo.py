#!/usr/bin/env python
"""Per-model zoo benchmark sweep (VERDICT r3 item 7).

Runs bench.py serially for every zoo config (BASELINE.json configs 1-5 +
R-FCN) at its headline batch and prints one markdown table row per run,
plus a JSON line with everything (appendable to DESIGN.md's measurement
log). One command on the real chip:

  python scripts/bench_zoo.py [--iters 20] [--only retinanet,rfcn]

Each child run reuses the repo compile cache, so a warm sweep is minutes.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (model, mode, batch, train_batch, extra --set overrides)
ZOO = [
    ("faster_rcnn", "infer", 1, 0, []),    # config 1: single-image path
    ("retinanet", "both", 8, 8, []),       # config 2: dense one-stage
    ("faster_rcnn", "both", 48, 16, []),   # config 3: batched two-stage
    ("mask_rcnn", "both", 48, 16, []),     # config 4: flagship
    ("mask_rcnn", "both", 32, 8,
     ["model.backbone=resnet101"]),        # config 5: R-101
    ("rfcn", "both", 16, 8, []),           # extra family: PSRoIPool vote
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--train-iters", type=int, default=8)
    ap.add_argument("--only", default="",
                    help="comma-separated model-name filter")
    args = ap.parse_args()
    only = set(filter(None, args.only.split(",")))

    rows = []
    for model, mode, batch, tbatch, extra in ZOO:
        if only and model not in only:
            continue
        cmd = [sys.executable, os.path.join(REPO, "bench.py"),
               "--model", model, "--mode", mode,
               "--batch", str(batch), "--train-batch", str(tbatch),
               "--iters", str(args.iters),
               "--train-iters", str(args.train_iters)]
        if extra:
            cmd += ["--set"] + extra
        label = f"{model} {' '.join(extra)} bs={batch}/{tbatch}".strip()
        print(f"== {label}", file=sys.stderr)
        # No watchdog for sweep children: a cold compile past the default
        # deadline would emit the (mask_rcnn headline) last-good record,
        # which must not be mistaken for this model's number.
        env = dict(os.environ)
        env.setdefault("BENCH_DEADLINE_S", "0")
        proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                              env=env)
        line = next((ln for ln in reversed(proc.stdout.splitlines())
                     if ln.strip().startswith("{")), None)
        if proc.returncode != 0 or line is None:
            print(proc.stderr[-1500:], file=sys.stderr)
            rows.append({"label": label, "error": proc.returncode})
            continue
        out = json.loads(line)
        if out.get("stale") or "error" in out:
            print(proc.stderr[-1500:], file=sys.stderr)
            rows.append({"label": label, "error":
                         out.get("stale_reason", out.get("error", "?"))})
            continue
        out["label"] = label
        rows.append(out)
        print(f"   {line}", file=sys.stderr)

    print("| config | infer img/s | vs A100 | train img/s | step ms |")
    print("|---|---|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {r['label']} | ERROR rc={r['error']} | | | |")
            continue
        print(f"| {r['label']} | {r.get('value', '-')} "
              f"| {r.get('vs_baseline', '-')} "
              f"| {r.get('train_img_s_chip', '-')} "
              f"| {r.get('train_step_ms', '-')} |")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
