#!/usr/bin/env bash
# Multi-host TPU pod launcher (counterpart of the reference's
# example_slurm.sbatch single-node SLURM script).
#
# On a TPU pod slice, run the SAME command on every host (e.g. via
# `gcloud compute tpus tpu-vm ssh $TPU --worker=all --command=...`);
# the CLI bootstraps jax.distributed and builds the (data, lat, channel)
# mesh over all global devices itself (--mesh auto is the default;
# override the factorization with --mesh D,L,C, or pass
# --coordinator-address for a manual rendezvous).
set -euo pipefail

exec python main.py \
  --model sfno --model-version film \
  --train --synthetic-data \
  --batch-size "${BATCH_PER_POD:-8}" \
  --learning-rate 5e-4 \
  --multi-step-training 1 \
  --scan-steps auto \
  --checkpointing-block \
  --compute-dtype bfloat16 \
  --checkpoint-backend orbax \
  --output-path "${OUTPUT:-./pod_run}" \
  "$@"
