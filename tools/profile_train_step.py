#!/usr/bin/env python
"""Delta-profile the full-size fine-tuning step on TPU.

Times three nested scopes, each as one K-iteration lax.scan program (axon
rules: chain state through the scan, fetch one scalar at the end):

  value      — forward + rollout loss only
  grad       — value_and_grad over the trainable (film) params
  train      — grad + optimizer update (trainer.train_steps)

The deltas isolate the backward pass and the optimizer.  Run with
--parity for the fp32 path.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import dataclasses
import time


def main(fast: bool = True, k: int = 8, reps: int = 3):
    import jax
    import jax.numpy as jnp

    import __graft_entry__
    from msfno_tpu.data.synthetic import gen_batch
    from msfno_tpu.training.partition import merge_params
    from msfno_tpu.training.trainer import Trainer
    from msfno_tpu.utils.config import TrainConfig

    cfg = __graft_entry__._flagship_cfg(fast=fast)
    cfg = dataclasses.replace(cfg, checkpointing_block=False)
    tcfg = TrainConfig(batch_size=1, film_scale_start=1.0)
    trainer = Trainer(cfg, tcfg)

    t0 = time.perf_counter()
    state = trainer.init_state()
    print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)

    batch = gen_batch(cfg, 1, 0, seed=0)
    era5 = jnp.asarray(batch.era5)
    sst = jnp.asarray(batch.sst)
    scale = state.film_scale

    # era5/sst/frozen MUST be explicit jit arguments: lowering a jit that
    # closes over GB-scale on-device arrays forces a device->host fetch of
    # the buffers as MLIR constants, which crawls through the axon relay at
    # MB/s (observed as a ">30 min compile")
    @jax.jit
    def scan_value(trainable, frozen, era5, sst, s0):
        params = merge_params(trainable, frozen)

        def body(s, _):
            e = era5.at[(0,) * era5.ndim].add(s * 1e-30)
            loss, _ = trainer._rollout_loss(params, e, sst, scale)
            return loss * 1e-30, ()

        return jax.lax.scan(body, s0, None, length=k)[0]

    @jax.jit
    def scan_grad(trainable, frozen, era5, sst):
        def body(tr, _):
            def lf(tr_):
                p = merge_params(tr_, frozen)
                return trainer._rollout_loss(p, era5, sst, scale)[0]

            loss, g = jax.value_and_grad(lf)(tr)
            tr = jax.tree.map(
                lambda a, b: a + 1e-30 * b.astype(a.dtype), tr, g
            )
            return tr, loss

        tr, losses = jax.lax.scan(body, trainable, None, length=k)
        return losses[-1] + sum(
            jnp.sum(x).astype(jnp.float32) * 0.0 for x in jax.tree.leaves(tr)
        )

    def timed(label, fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.asarray(out).reshape(-1)[0])
        print(f"{label}: compile+first {time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        float(jnp.asarray(out).reshape(-1)[0])
        dt = (time.perf_counter() - t0) / (reps * k)
        print(f"{label}: {dt * 1e3:.1f} ms/step", flush=True)
        return dt

    tv = timed(
        "value(fwd+loss)", scan_value,
        state.trainable, state.frozen, era5, sst, jnp.float32(0.0),
    )
    tg = timed(
        "value_and_grad ", scan_grad, state.trainable, state.frozen, era5, sst
    )

    era5_k = jnp.broadcast_to(era5[None], (k,) + era5.shape)
    sst_k = jnp.broadcast_to(sst[None], (k,) + sst.shape)

    def full(st):
        st, m = trainer.train_steps(st, era5_k, sst_k)
        return m["loss"][-1]

    tt = timed("full train step", full, state)
    print(
        f"deltas: backward {1e3 * (tg - tv):.1f} ms, "
        f"optimizer+metrics {1e3 * (tt - tg):.1f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main(fast="--parity" not in sys.argv)
