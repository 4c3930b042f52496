#!/bin/bash
# Round-5 second-half re-measurement sweep (run when the axon tunnel is
# healthy): encoder-DFT fusion A/B, headline bench, train-step ladder with
# the bf16 input-transfer lever, and fresh XLA traces for the component
# budget.  Each stage under timeout so a wedged tunnel fails the stage
# instead of hanging the sweep (same pattern as tpu_recheck.sh).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_recheck_r5b.log}
: > "$LOG"
run() {
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout "${STAGE_TIMEOUT:-1800}" "$@" >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}
run python tools/bench_encoder_fusion.py
run python tools/bench_inner_fuse.py
run python bench.py
run python tools/bench_train_step.py --no-remat --bf16-frozen
run python tools/bench_train_step.py --no-remat --bf16-frozen --transfer-bf16
run python tools/profile_fast_tier.py
run python tools/profile_scan_tier.py
echo "DONE $(date +%H:%M:%S)" >> "$LOG"
