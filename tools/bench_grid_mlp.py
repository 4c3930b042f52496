#!/usr/bin/env python
"""A/B the fused grid-MLP kernel (ops/pallas/grid_mlp.py) on TPU.

Times the full-size filmed forward step with pallas_grid_mlp off vs on
(fast tier + balanced tier), plus the isolated encoder/decoder ops at
721x1440.  Chained timing with a scalar fetch at the end (axon rules;
see bench.py docstring).

Usage: python tools/bench_grid_mlp.py [iters] [stage ...]
  stages: ops | fast-off | fast-on | balanced-off | balanced-on
  (default: all).  Each stage is independently runnable so the unattended
  tpu_watch.sh sweep can retry just the stage a tunnel outage killed; the
  persistent XLA compile cache makes retried stages skip their compiles.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import dataclasses
import time


def _enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


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

    # weights/pe are explicit jit ARGUMENTS, never closure constants: lowering
    # a closed-over on-device array forces a device->host fetch, and the axon
    # tunnel cannot move the ~1 GB pe buffer (every closure-constant variant
    # of this bench wedged the remote_compile channel; 2026-08-18/19)
    def xla_enc(x, w1, b1, w2, pe):
        h = jax.nn.gelu(x @ w1 + b1, approximate=False)
        return h @ w2 + pe

    def pal_enc(x, w1, b1, w2, pe):
        return grid_mlp(x, w1, b1, w2, pe=pe)

    def pal_enc_f32(x, w1, b1, w2, pe):
        # like-for-like vs the XLA path: same fp32 inputs, no bf16 MXU cast,
        # so the delta isolates the fusion (one HBM round trip) from the
        # dtype choice.  Note XLA's DEFAULT-precision f32 matmul already
        # rounds inputs to bf16 on the MXU (DESIGN.md precision ladder), so
        # the bf16 variant above is the production-matched comparison.
        return grid_mlp(x, w1, b1, w2, pe=pe, mxu_dtype="float32")

    for name, fn in [("encoder xla       ", jax.jit(xla_enc)),
                     ("encoder pallas bf16", jax.jit(pal_enc)),
                     ("encoder pallas f32 ", jax.jit(pal_enc_f32))]:
        out = fn(x, w1, b1, w2, pe)
        float(jnp.sum(out[..., 0]))
        t0 = time.perf_counter()
        acc = x
        for _ in range(iters):
            # chain via a cheap reduction back to the input shape
            out = fn(acc, w1, b1, w2, pe)
            acc = x + out[..., :C] * 1e-9
        float(jnp.sum(acc[..., 0]))
        dt = (time.perf_counter() - t0) / iters
        print(f"  {name}: {dt * 1e3:.2f} ms", flush=True)


def main(iters: int = 8, stages: list[str] | None = None):
    import __graft_entry__

    _enable_compile_cache()
    all_stages = ["ops", "fast-off", "fast-on", "balanced-off", "balanced-on"]
    stages = stages or all_stages
    for s in stages:
        if s not in all_stages:
            raise SystemExit(f"unknown stage {s!r}; choose from {all_stages}")

    if "ops" in stages:
        print("== isolated full-res encoder ==", flush=True)
        _time_ops(iters)

    for tier, kw in [
        ("fast", dict(fast=True)),
        ("balanced", dict(balanced=True)),
    ]:
        base = __graft_entry__._flagship_cfg(**kw)
        for label, on in [("off", False), ("on", True)]:
            if f"{tier}-{label}" not in stages:
                continue
            cfg = dataclasses.replace(base, pallas_grid_mlp=on)
            print(f"== {tier} tier, grid-mlp {label} ==", flush=True)
            _time_forward(cfg, iters)


if __name__ == "__main__":
    argv = sys.argv[1:]
    n = int(argv[0]) if argv and argv[0].isdigit() else 8
    rest = argv[1:] if argv and argv[0].isdigit() else argv
    main(n, rest or None)
