#!/bin/bash
# One-shot TPU re-measurement sweep after the merged-DFT + box3 + bf16-frozen
# changes (run when the axon tunnel is healthy).  Each stage under timeout so
# a wedged tunnel fails the stage instead of hanging the sweep.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_recheck.log}
: > "$LOG"
run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout 1800 "$@" >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}
run python tools/bench_train_step.py --no-remat
run python tools/bench_train_step.py --no-remat --bf16-frozen
run python tools/bench_grid_mlp.py
run python tools/bench_rollout28.py
run python bench.py
run python tools/mem_analysis.py
echo "DONE $(date +%H:%M:%S)" >> "$LOG"
