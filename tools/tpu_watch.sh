#!/bin/bash
# Unattended TPU bench sweep that survives axon-tunnel outages.
#
# The remote-TPU tunnel wedges for minutes-to-hours (backend init or first
# compile blocks forever; observed 2026-08-17..19).  This watcher probes the
# tunnel with a throwaway 1-matmul subprocess and only dispatches the next
# sweep stage after a healthy probe; a stage that still hangs is capped by
# its own timeout and the watcher re-probes before moving on.
#
# Usage: tools/tpu_watch.sh [logfile] [stage ...]
#   default stages = grid-MLP A/B, scan-step train bench, headline bench;
#   pass explicit stages (shell commands) for any other sweep, e.g.
#   tools/tpu_watch.sh /tmp/bal.log "python -u tools/bench_balanced.py 10"
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_sweep.log}
shift 2>/dev/null || true
: >> "$LOG"

probe() {
  timeout 120 python - > /dev/null 2>&1 << 'EOF'
import jax, jax.numpy as jnp
(jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()
EOF
}

wait_healthy() {
  local n=0
  until probe; do
    n=$((n + 1))
    echo "probe $n failed; tunnel down ($(date +%H:%M:%S))" >> "$LOG"
    sleep 300
  done
  echo "tunnel healthy ($(date +%H:%M:%S))" >> "$LOG"
}

run_stage() {
  wait_healthy
  echo "=== $* ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- exit $? ($(date +%H:%M:%S)) ---" >> "$LOG"
}

if [ $# -gt 0 ]; then
  for s in "$@"; do
    run_stage bash -c "$s"
  done
else
  run_stage python tools/bench_grid_mlp.py 10
  run_stage python tools/bench_train_step.py --no-remat
  run_stage python bench.py
fi
echo "SWEEP DONE $(date +%H:%M:%S)" >> "$LOG"
