#!/usr/bin/env python
"""Bisect the optimizer+metrics delta in the full train step.

profile_train_step shows value_and_grad at 41.4 ms/step but the full
train_steps scan at 65.8 ms/step.  This probe times intermediate scans to
find the 24 ms: (a) xs-sliced era5 instead of a closed-over constant,
(b) + adam update, (c) + metrics stacking.  Axon rules: explicit jit args,
chain state, fetch one scalar.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import dataclasses
import time


def main(fast: bool = True, k: int = 8, reps: int = 3):
    import jax
    import jax.numpy as jnp
    import optax

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
    n_tr = sum(x.size for x in jax.tree.leaves(state.trainable))
    n_fr = sum(x.size for x in jax.tree.leaves(state.frozen))
    print(f"trainable {n_tr/1e6:.1f}M / frozen {n_fr/1e6:.1f}M params", flush=True)

    batch = gen_batch(cfg, 1, 0, seed=0)
    era5 = jnp.asarray(batch.era5)
    sst = jnp.asarray(batch.sst)
    scale = state.film_scale
    era5_k = jnp.broadcast_to(era5[None], (k,) + era5.shape)
    sst_k = jnp.broadcast_to(sst[None], (k,) + sst.shape)

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
        print(f"{label}: {dt * 1e3:.2f} ms/step", flush=True)
        return dt

    # (v2) value only, xs-sliced: honest forward+loss+data cost
    @jax.jit
    def scan_value_xs(trainable, frozen, era5_k, sst_k, s0):
        params = merge_params(trainable, frozen)

        def body(s, xs):
            e, st = xs
            loss, _ = trainer._rollout_loss(params, e, st, scale)
            return loss * 1e-30 + s * 1e-30, ()

        return jax.lax.scan(body, s0, (era5_k, sst_k))[0]

    # (g2) grad, constant-but-perturbed era5 (defeats hoisting, no slicing):
    # honest grad cost minus the xs dynamic-slice
    @jax.jit
    def scan_grad_pert(trainable, frozen, era5, sst):
        def body(tr, _):
            e = era5.at[(0,) * era5.ndim].add(
                jax.tree.leaves(tr)[0].reshape(-1)[0] * 1e-30
            )

            def lf(tr_):
                p = merge_params(tr_, frozen)
                return trainer._rollout_loss(p, e, sst, scale)[0]

            loss, g = jax.value_and_grad(lf)(tr)
            tr = jax.tree.map(lambda a, b: a + 1e-30 * b.astype(a.dtype), tr, g)
            return tr, loss

        tr, losses = jax.lax.scan(body, trainable, None, length=k)
        return losses[-1] + sum(
            jnp.sum(x).astype(jnp.float32) * 0.0 for x in jax.tree.leaves(tr)
        )

    # (a) grad with xs-sliced era5/sst (per-iteration dynamic-slice copy)
    @jax.jit
    def scan_grad_xs(trainable, frozen, era5_k, sst_k):
        def body(tr, xs):
            e, s = xs

            def lf(tr_):
                p = merge_params(tr_, frozen)
                return trainer._rollout_loss(p, e, s, scale)[0]

            loss, g = jax.value_and_grad(lf)(tr)
            tr = jax.tree.map(lambda a, b: a + 1e-30 * b.astype(a.dtype), tr, g)
            return tr, loss

        tr, losses = jax.lax.scan(body, trainable, (era5_k, sst_k))
        return losses[-1] + sum(
            jnp.sum(x).astype(jnp.float32) * 0.0 for x in jax.tree.leaves(tr)
        )

    # (b) grad (constant batch) + adam update, carry (tr, opt), no metrics
    @jax.jit
    def scan_opt(trainable, opt_state, frozen, era5, sst):
        def body(carry, _):
            tr, opt = carry

            def lf(tr_):
                p = merge_params(tr_, frozen)
                return trainer._rollout_loss(p, era5, sst, scale)[0]

            loss, g = jax.value_and_grad(lf)(tr)
            updates, opt = trainer.tx.update(g, opt, tr)
            tr = optax.apply_updates(tr, updates)
            return (tr, opt), loss

        (tr, _), losses = jax.lax.scan(
            body, (trainable, opt_state), None, length=k
        )
        return losses[-1] + sum(
            jnp.sum(x).astype(jnp.float32) * 0.0 for x in jax.tree.leaves(tr)
        )

    # (c) = (b) + per_step metrics + grad_norm (full _train_step_impl minus
    # xs slicing), isolating the metrics cost
    @jax.jit
    def scan_full_const(trainable, opt_state, frozen, era5, sst):
        def body(carry, _):
            tr, opt = carry

            def lf(tr_):
                p = merge_params(tr_, frozen)
                return trainer._rollout_loss(p, era5, sst, scale)

            (loss, per_step), g = jax.value_and_grad(lf, has_aux=True)(tr)
            updates, opt = trainer.tx.update(g, opt, tr)
            tr = optax.apply_updates(tr, updates)
            gn = optax.global_norm(g)
            return (tr, opt), (loss, per_step, gn)

        (tr, _), (losses, _, _) = jax.lax.scan(
            body, (trainable, opt_state), None, length=k
        )
        return losses[-1] + sum(
            jnp.sum(x).astype(jnp.float32) * 0.0 for x in jax.tree.leaves(tr)
        )

    timed("g2) grad, perturbed ", scan_grad_pert,
          state.trainable, state.frozen, era5, sst)
    timed("b) grad+adam        ", scan_opt,
          state.trainable, state.opt_state, state.frozen, era5, sst)
    timed("c) +metrics/gnorm   ", scan_full_const,
          state.trainable, state.opt_state, state.frozen, era5, sst)
    timed("a) grad, xs-sliced  ", scan_grad_xs,
          state.trainable, state.frozen, era5_k, sst_k)


if __name__ == "__main__":
    main(fast="--parity" not in sys.argv)
