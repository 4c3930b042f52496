#!/usr/bin/env python
"""Throughput vs batch size for the flagship 6h step (ensemble serving:
S2S systems run ~50-member ensembles).  In-scan, on-device inputs."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__
    from msfno_tpu.models import FourierNeuralOperatorNetFilmed

    cfg = __graft_entry__._flagship_cfg(fast=True)
    model = FourierNeuralOperatorNetFilmed(cfg)
    h, w = cfg.img_size
    f = cfg.film
    grid_points = h * w

    params = None
    for b in (1, 2, 4):
        def build(key, b=b):
            kx, ks = jax.random.split(key)
            x0 = jax.random.normal(kx, (b, h, w, cfg.in_chans), jnp.float32)
            sst = jax.random.normal(ks, (b, f.temporal_step, *f.sst_shape))
            sst = sst.at[..., :40, :].set(jnp.nan)
            return x0, sst

        try:
            x0, sst = jax.jit(build)(jax.random.PRNGKey(0))
            if params is None:
                params = jax.jit(model.init)(jax.random.PRNGKey(1), x0, sst)[
                    "params"
                ]

            def roll(params, x0, sst):
                def body(state, _):
                    nxt = model.apply({"params": params}, state, sst, 1.0)
                    return nxt, jnp.mean(nxt[..., 0])
                _, m = jax.lax.scan(body, x0, None, length=16)
                return m

            jroll = jax.jit(roll)
            float(jnp.sum(jroll(params, x0, sst)))
            t0 = time.perf_counter()
            float(jnp.sum(jroll(params, x0, sst)))
            dt = (time.perf_counter() - t0) / 16
            print(
                f"batch {b}: {dt*1e3:.1f} ms/step, "
                f"{b/dt:.1f} samples/s, "
                f"{b*grid_points/dt/1e6:.0f} Mgridpoints/s",
                flush=True,
            )
        except Exception as e:
            print(f"batch {b}: failed ({type(e).__name__})", flush=True)
            break


if __name__ == "__main__":
    main()
