#!/usr/bin/env python
"""Time one full-size MSFNO fine-tuning step on TPU (BASELINE.json config 3:
FiLM generator + modulated blocks, film-only gradients).

Chains the jitted train step state->state and fetches a scalar at the end
(axon timing rules; see bench.py docstring)."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import time

import numpy as np


def main(fast: bool = True, iters: int = 5, remat: bool = True,
         bf16_frozen: bool = False, transfer_bf16: bool = False):
    import dataclasses

    import jax
    import jax.numpy as jnp

    import __graft_entry__
    from msfno_tpu.data.synthetic import gen_batch
    from msfno_tpu.training.trainer import Trainer
    from msfno_tpu.utils.config import TrainConfig

    cfg = __graft_entry__._flagship_cfg(fast=fast)
    if not remat:
        # film-only training (film_layers=1) backprops only through the last
        # block + decoder; per-block remat then just re-runs block 11's
        # full-res inverse SHT in the backward for no memory benefit
        cfg = dataclasses.replace(cfg, checkpointing_block=False)
    tcfg = TrainConfig(batch_size=1, film_scale_start=1.0,
                       bf16_frozen_params=bf16_frozen)
    trainer = Trainer(cfg, tcfg)

    t0 = time.perf_counter()
    state = trainer.init_state()
    print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)

    batch = gen_batch(cfg, 1, 0, seed=0)
    # --transfer-bf16 mirrors PrefetchLoader(transfer_dtype=bf16): the host
    # ships the chunk half-size, so the in-scan per-step dynamic-slice reads
    # half the HBM (the ~7 ms slice/copy row in /tmp/jax-trace-train-r5).
    # The loss target is then bf16-quantized — the printed loss is the
    # numerics evidence for the A/B.
    in_dtype = jnp.bfloat16 if transfer_bf16 else jnp.float32
    era5 = jnp.asarray(batch.era5, dtype=in_dtype)
    sst = jnp.asarray(batch.sst, dtype=in_dtype)

    t0 = time.perf_counter()
    state, metrics = trainer._train_step(state, era5, sst)
    loss0 = float(metrics["loss"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s, "
          f"loss={loss0:.4f}", flush=True)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = trainer._train_step(state, era5, sst)
    loss = float(metrics["loss"])  # scalar fetch = sync
    dt = (time.perf_counter() - t0) / iters
    print(f"train step: {dt * 1e3:.1f} ms ({1.0 / dt:.2f} steps/s), "
          f"loss={loss:.4f}", flush=True)

    # scan-chained: K steps per launch (trainer.train_steps) — the true
    # device rate without per-call dispatch
    k = 8
    era5_k = jnp.broadcast_to(era5[None], (k,) + era5.shape)
    sst_k = jnp.broadcast_to(sst[None], (k,) + sst.shape) if sst is not None else None
    t0 = time.perf_counter()
    state, m = trainer.train_steps(state, era5_k, sst_k)
    float(m["loss"][-1])
    print(f"scan compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(2):
        state, m = trainer.train_steps(state, era5_k, sst_k)
    loss = float(m["loss"][-1])
    dt = (time.perf_counter() - t0) / (2 * k)
    print(f"scan train step: {dt * 1e3:.1f} ms ({1.0 / dt:.2f} steps/s), "
          f"loss={loss:.4f}", flush=True)


if __name__ == "__main__":
    main(fast="--parity" not in sys.argv, remat="--no-remat" not in sys.argv,
         bf16_frozen="--bf16-frozen" in sys.argv,
         transfer_bf16="--transfer-bf16" in sys.argv)
