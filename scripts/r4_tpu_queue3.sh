#!/bin/bash
# Round-4 TPU queue, part 3: runs after the zoo sweep (queue2) exits.
# 1. eval-path end-to-end throughput at the headline config (VERDICT r3
#    weak #4's "eval-driver img/s number").
# 2. RetinaNet fast-config line (merged pre-NMS cap + fixpoint NMS,
#    configs/retinanet_fast.yaml) for the zoo table.
set -u
LOG=/tmp/r4_queue3.log
cd /root/repo

echo "=== queue3 start $(date -u +%H:%M:%S)" >> "$LOG"
if [ -f /tmp/r4_queue2.pid ]; then
  while kill -0 "$(cat /tmp/r4_queue2.pid)" 2>/dev/null; do sleep 30; done
fi
echo "=== queue2 done, starting $(date -u +%H:%M:%S)" >> "$LOG"

run() {
  echo "--- RUN: $* ($(date -u +%H:%M:%S))" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ($(date -u +%H:%M:%S))" >> "$LOG"
}

run timeout 5400 python scripts/bench_eval_path.py --batch 48 --iters 6

run env BENCH_DEADLINE_S=0 timeout 5400 python bench.py --mode infer --batch 8 \
    --model retinanet --set retinanet.merged_pre_nms_topk=2000

echo "=== queue3 done $(date -u +%H:%M:%S)" >> "$LOG"
