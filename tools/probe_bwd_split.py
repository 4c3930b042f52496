#!/usr/bin/env python
"""Split the 20 ms film-only backward into (backbone cotangent chain:
loss -> decoder -> block-11 film site) vs (film-generator backward).

Probe 1 takes gradients w.r.t. gamma/beta directly (film generator replaced
by constants): times the backbone chain alone.
Probe 2 takes gradients of a scalar readout of the film-generator outputs
w.r.t. film params: times the generator fwd+bwd alone.
Axon rules: explicit jit args, scan-chained, one scalar fetch.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import dataclasses
import time


def main(fast: bool = True, k: int = 8, reps: int = 3,
         probes: tuple = (1, 2)):
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
    params = merge_params(state.trainable, state.frozen)

    model = trainer.model

    def timed(label, fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.asarray(out).reshape(-1)[0])
        print(f"{label}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        float(jnp.asarray(out).reshape(-1)[0])
        dt = (time.perf_counter() - t0) / (reps * k)
        print(f"{label}: {dt * 1e3:.2f} ms/step", flush=True)
        return dt

    # 1) gradient w.r.t. the film `scale` scalar: the cotangent reaches every
    # film site (loss -> decoder -> block-11 film) but never enters the film
    # generator (gamma/beta are constants w.r.t. scale) -- isolates the
    # backbone cotangent chain
    @jax.jit
    def scan_grad_scale(params, era5, sst, s0):
        def body(s, _):
            # iteration chaining rides the scale scalar alone; perturbing
            # era5 would copy the 0.6 GB field per iteration (OOMs at 721res)
            def lf(s_):
                loss, _ = trainer._rollout_loss(params, era5, sst, s_)
                return loss

            loss, ds = jax.value_and_grad(lf)(s0 + s * 1e-30)
            return loss * 1e-30 + ds * 1e-30, ()

        return jax.lax.scan(body, jnp.float32(0.0), None, length=k)[0]

    # 2) film-generator fwd+bwd alone (scalar readout of gamma/beta)
    from msfno_tpu.models.film.wrapper import FilmWrapper

    film_mod = FilmWrapper(cfg.film)

    @jax.jit
    def scan_grad_gen(trainable, frozen, sst):
        def body(tr, _):
            def lf(tr_):
                p = merge_params(tr_, frozen)
                out = film_mod.apply(
                    {"params": p["film_gen"]}, sst, deterministic=True
                )
                return jnp.sum(out.astype(jnp.float32) ** 2)

            loss, g = jax.value_and_grad(lf)(tr)
            tr = jax.tree.map(lambda a, b_: a + 1e-30 * b_.astype(a.dtype),
                              tr, g)
            return tr, loss

        tr, losses = jax.lax.scan(body, trainable, None, length=k)
        return losses[-1] + sum(
            jnp.sum(x).astype(jnp.float32) * 0.0 for x in jax.tree.leaves(tr)
        )

    # NOTE on probe 1 semantics: era5/sst are loop constants, so XLA hoists
    # the film generator AND the frozen prefix (encoder + blocks 0..10 +
    # block-11 filter, all scale-independent) out of the scan.  What it
    # times is the fwd+bwd of the TAIL segment alone: film site -> block-11
    # MLP -> decoder -> loss.  measured 25.9 ms at 721res fast (2026-08-17).
    if 1 in probes:
        timed("1) tail-segment fwd+bwd", scan_grad_scale,
              params, era5, sst, scale)
    # film wrapper expects one step's (B, T, Hs, Ws) window
    if 2 in probes:
        timed("2) film-gen fwd+bwd    ", scan_grad_gen,
              state.trainable, state.frozen, sst[1])


if __name__ == "__main__":
    main(fast="--parity" not in sys.argv)
