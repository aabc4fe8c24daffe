#!/bin/bash
# Round-4 serial TPU experiment queue. Waits for the headline bench
# (pid file $1) to finish, then runs the queued hardware A/Bs one at a
# time (this box has one CPU core; the chip is behind a flaky relay —
# keep everything serial and logged). Each step is its own python
# process so a wedged device never blocks the next step.
set -u
PIDFILE="${1:-/tmp/bench_r4.pid}"
LOG=/tmp/r4_queue.log
cd /root/repo

echo "=== queue start $(date -u +%H:%M:%S)" >> "$LOG"
if [ -f "$PIDFILE" ]; then
  # read the pid ONCE: a vanished/rewritten pid file must not leave the
  # loop waiting on an unrelated reused pid (advisor r4)
  PID="$(cat "$PIDFILE")"
  while [ -n "$PID" ] && kill -0 "$PID" 2>/dev/null; do sleep 30; done
fi
echo "=== headline bench done $(date -u +%H:%M:%S)" >> "$LOG"

run() {
  echo "--- RUN: $* ($(date -u +%H:%M:%S))" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ($(date -u +%H:%M:%S))" >> "$LOG"
}

# 1. Validate the Pallas backward on hardware (quick; guards the A/Bs).
run timeout 1800 python scripts/drive_roialign_bwd_tpu.py

# 2. Standalone backward kernel A/B at train shapes (sep vs xla).
run python scripts/bench_roialign_bwd.py --algos sep,xla --batch 16

# 3. Full-program train A/B: bwd_order=xla at the bs=16 headline.
run env BENCH_DEADLINE_S=0 python bench.py --mode train --train-batch 16 \
    --set roi.bwd_order=xla

# 4. Remat A/B: does bs=32 + remat clear 2x the bs=16 step time?
run env BENCH_DEADLINE_S=0 python bench.py --mode train --train-batch 32 \
    --set model.remat=True

# 5. Inference scaling probe: bs=64 with auto chunking.
run env BENCH_DEADLINE_S=0 python bench.py --mode infer --batch 64

echo "=== queue done $(date -u +%H:%M:%S)" >> "$LOG"
