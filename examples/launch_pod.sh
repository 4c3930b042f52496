#!/usr/bin/env bash
# Multi-host TPU pod launcher (counterpart of the reference's
# example_slurm.sbatch single-node SLURM script).
#
# On a TPU pod slice, run the SAME command on every host (e.g. via
# `gcloud compute tpus tpu-vm ssh $TPU --worker=all --command=...`);
# jax.distributed.initialize() wires the global device view
# (msfno_tpu/parallel/distributed.py) and the mesh spans ICI.
set -euo pipefail

exec python main.py \
  --model sfno --model-version film \
  --train --synthetic-data \
  --batch-size "${BATCH_PER_POD:-8}" \
  --learning-rate 5e-4 \
  --multi-step-training 1 \
  --checkpointing-block \
  --compute-dtype bfloat16 \
  --output-path "${OUTPUT:-./pod_run}" \
  "$@"
