#!/bin/bash
# Round-4 serial TPU queue, second attempt (relay came back ~14:00 UTC).
# Remaining hardware items from VERDICT r3: the roi.bwd_order A/B
# (standalone + full train program) and the per-model zoo sweep.
# Serial (one CPU core, flaky relay); each step is its own python
# process so a wedged device never blocks the next step.
set -u
LOG=/tmp/r4_queue2.log
cd /root/repo

echo "=== queue2 start $(date -u +%H:%M:%S)" >> "$LOG"

run() {
  echo "--- RUN: $* ($(date -u +%H:%M:%S))" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ($(date -u +%H:%M:%S))" >> "$LOG"
}

# 1. Standalone backward kernel A/B at train shapes (sep vs xla).
#    (died at 13:37 on a relay broken pipe mid-compile; retry)
run timeout 5400 python scripts/bench_roialign_bwd.py --algos sep,xla --batch 16

# 2. Full-program train A/B: bwd_order=xla at the bs=16 headline.
#    (died at 13:41 with RESOURCE_EXHAUSTED right after the broken-pipe
#    run — retry on a fresh device to tell wedge from genuine OOM)
run env BENCH_DEADLINE_S=0 timeout 5400 python bench.py --mode train --train-batch 16 \
    --set roi.bwd_order=xla

# 3. Same at bs=8 (if bs=16 xla genuinely OOMs, this is the fallback A/B
#    against the known 178 ms bs=8 sep step).
run env BENCH_DEADLINE_S=0 timeout 5400 python bench.py --mode train --train-batch 8 \
    --set roi.bwd_order=xla

# 4. Per-model zoo sweep (VERDICT r3 item 7): retinanet, faster_rcnn,
#    mask_rcnn R-50/R-101, rfcn — infer + train at headline batches.
run env BENCH_DEADLINE_S=0 timeout 21600 python scripts/bench_zoo.py

echo "=== queue2 done $(date -u +%H:%M:%S)" >> "$LOG"
