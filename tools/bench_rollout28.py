#!/usr/bin/env python
"""28-day autoregressive S2S rollout at full resolution on TPU
(BASELINE.json config 4): 112 x 6h steps in a single lax.scan program,
HBM-resident state throughout.

Relay-friendly: SST windows are generated on device inside the program and
only per-step scalar diagnostics are fetched (the axon tunnel's host<->device
path is ~MB/s; see memory axon-tpu-quirks)."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import time

import numpy as np


def main(days: int = 28):
    import jax
    import jax.numpy as jnp

    import __graft_entry__
    from msfno_tpu.models import FourierNeuralOperatorNetFilmed
    from msfno_tpu.models.variables import channel_index

    cfg = __graft_entry__._flagship_cfg(fast=True)
    model = FourierNeuralOperatorNetFilmed(cfg)
    h, w = cfg.img_size
    f = cfg.film
    steps = days * 4
    t2m = channel_index("2t")

    def build_inputs(key):
        kx, ks = jax.random.split(key)
        x0 = jax.random.normal(kx, (1, h, w, cfg.in_chans), jnp.float32)
        sst = jax.random.normal(
            ks, (1, f.temporal_step, *f.sst_shape), jnp.float32
        )
        # synthetic land: mask a fixed band
        sst = sst.at[..., :40, :].set(jnp.nan)
        return x0, sst

    t0 = time.perf_counter()
    x0, sst = jax.jit(build_inputs)(jax.random.PRNGKey(0))
    params = jax.jit(model.init)(jax.random.PRNGKey(1), x0, sst)["params"]
    print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)

    def roll(params, x0, sst):
        def body(state, _):
            nxt = model.apply({"params": params}, state, sst, 1.0)
            diag = jnp.stack(
                [
                    jnp.mean(nxt[..., t2m]),
                    jnp.std(nxt[..., t2m]),
                    jnp.max(jnp.abs(nxt)),
                ]
            )
            return nxt, diag
        _, diags = jax.lax.scan(body, x0, None, length=steps)
        return diags

    jroll = jax.jit(roll)
    t0 = time.perf_counter()
    diags = np.asarray(jroll(params, x0, sst))
    total = time.perf_counter() - t0
    print(
        f"{days}-day rollout ({steps} steps incl. compile): {total:.1f}s",
        flush=True,
    )
    t0 = time.perf_counter()
    diags = np.asarray(jroll(params, x0, sst))
    total = time.perf_counter() - t0
    print(
        f"{days}-day rollout (compiled): {total:.2f}s "
        f"({total / steps * 1e3:.1f} ms/step)",
        flush=True,
    )
    assert np.all(np.isfinite(diags)), "non-finite diagnostics"
    print(
        f"t2m mean step0={diags[0,0]:.3f} stepN={diags[-1,0]:.3f}; "
        f"max|state| stepN={diags[-1,2]:.1f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
