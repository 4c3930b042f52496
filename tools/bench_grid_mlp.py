#!/usr/bin/env python
"""A/B the fused grid-MLP kernel (ops/pallas/grid_mlp.py) on TPU.

Times the full-size filmed forward step with pallas_grid_mlp off vs on
(fast tier + balanced tier), plus the isolated encoder/decoder ops at
721x1440.  Chained timing with a scalar fetch at the end (axon rules;
see bench.py docstring).

Usage: python tools/bench_grid_mlp.py [iters]
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import dataclasses
import time


def _time_forward(cfg, iters):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from msfno_tpu.data.synthetic import synthetic_land_mask
    from msfno_tpu.models.sfno.sfnonet import FourierNeuralOperatorNetFilmed

    model = FourierNeuralOperatorNetFilmed(cfg)
    h, w = cfg.img_size
    x = jnp.zeros((1, h, w, cfg.in_chans), jnp.float32)
    hs, ws = cfg.film.sst_shape
    sst_np = np.random.default_rng(0).standard_normal(
        (1, cfg.film.temporal_step, hs, ws)
    ).astype(np.float32)
    sst_np[..., synthetic_land_mask(hs, ws)] = np.nan
    sst = jnp.asarray(sst_np)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, sst)

    step = jax.jit(lambda p, x, s: model.apply(p, x, s, 1.0))
    t0 = time.perf_counter()
    out = step(params, x, sst)
    float(jnp.sum(out[..., 0]))
    print(f"  compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    state = x
    for _ in range(iters):
        state = step(params, state, sst)
    scal = float(jnp.sum(state[..., 0]))
    dt = (time.perf_counter() - t0) / iters
    print(f"  step: {dt * 1e3:.1f} ms ({1 / dt:.1f} steps/s)  [chk {scal:.3e}]",
          flush=True)
    return dt


def _time_ops(iters):
    """Isolated encoder (with pe) and decoder (with skip) at full res."""
    import jax
    import jax.numpy as jnp
    from msfno_tpu.ops.pallas.grid_mlp import grid_mlp

    H, W, C, E = 721, 1440, 73, 256
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, H, W, C), jnp.float32)
    w1 = 0.02 * jax.random.normal(key, (C, E))
    b1 = jnp.zeros((E,))
    w2 = 0.02 * jax.random.normal(key, (E, E))
    pe = 0.02 * jax.random.normal(key, (H, W, E))

    def xla_enc(x):
        h = jax.nn.gelu(x @ w1 + b1, approximate=False)
        return h @ w2 + pe

    def pal_enc(x):
        return grid_mlp(x, w1, b1, w2, pe=pe)

    def pal_enc_f32(x):
        # like-for-like vs the XLA path: same fp32 inputs, no bf16 MXU cast,
        # so the delta isolates the fusion (one HBM round trip) from the
        # dtype choice.  Note XLA's DEFAULT-precision f32 matmul already
        # rounds inputs to bf16 on the MXU (DESIGN.md precision ladder), so
        # the bf16 variant above is the production-matched comparison.
        return grid_mlp(x, w1, b1, w2, pe=pe, mxu_dtype="float32")

    for name, fn in [("encoder xla       ", jax.jit(xla_enc)),
                     ("encoder pallas bf16", jax.jit(pal_enc)),
                     ("encoder pallas f32 ", jax.jit(pal_enc_f32))]:
        out = fn(x)
        float(jnp.sum(out[..., 0]))
        t0 = time.perf_counter()
        acc = x
        for _ in range(iters):
            # chain via a cheap reduction back to the input shape
            out = fn(acc)
            acc = x + out[..., :C] * 1e-9
        float(jnp.sum(acc[..., 0]))
        dt = (time.perf_counter() - t0) / iters
        print(f"  {name}: {dt * 1e3:.2f} ms", flush=True)


def main(iters: int = 8):
    import __graft_entry__

    print("== isolated full-res encoder ==", flush=True)
    _time_ops(iters)

    for tier, kw in [
        ("fast", dict(fast=True)),
        ("balanced", dict(balanced=True)),
    ]:
        base = __graft_entry__._flagship_cfg(**kw)
        for label, on in [("off", False), ("on", True)]:
            cfg = dataclasses.replace(base, pallas_grid_mlp=on)
            print(f"== {tier} tier, grid-mlp {label} ==", flush=True)
            _time_forward(cfg, iters)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
