#!/usr/bin/env python
"""Latency/accuracy ladder for the flagship MSFNO step on TPU.

Varies the three MXU-dtype knobs (sht_mxu_dtype, spectral_mxu_dtype,
compute_dtype) + Pallas independently; reports each config's chained latency
and single-step rel-L2 drift vs the all-fp32 parity path.  This grounds the
choice of the "fast" serving config in measured numbers instead of guesses.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import dataclasses
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__
    from msfno_tpu.models import FourierNeuralOperatorNetFilmed
    from msfno_tpu.data.synthetic import synthetic_land_mask

    base = __graft_entry__._flagship_cfg()  # parity: fp32 everywhere
    base = dataclasses.replace(base, compute_dtype="float32")

    h, w = base.img_size
    x = None
    params = None

    def build(cfg):
        nonlocal x, params
        model = FourierNeuralOperatorNetFilmed(cfg)
        if x is None:
            xx = jnp.zeros((1, h, w, cfg.in_chans), jnp.float32)
            hs, ws = cfg.film.sst_shape
            sst_np = (
                np.random.default_rng(0)
                .standard_normal((1, cfg.film.temporal_step, hs, ws))
                .astype(np.float32)
            )
            sst_np[..., synthetic_land_mask(hs, ws)] = np.nan
            x = (xx, jnp.asarray(sst_np))
            params = jax.jit(model.init)(jax.random.PRNGKey(0), *x)
        fn = lambda p, a, s: model.apply(p, a, s, 1.0)
        return jax.jit(fn).lower(params, *x).compile()

    def timeit(c, iters=10):
        out = c(params, *x)
        float(jnp.sum(out[..., 0]))
        t0 = time.perf_counter()
        st = x[0]
        for _ in range(iters):
            st = c(params, st, x[1])
        float(jnp.sum(st[..., 0]))
        return (time.perf_counter() - t0) / iters, out

    rel = jax.jit(lambda a, b: jnp.linalg.norm(a - b) / jnp.linalg.norm(a))

    t0 = time.perf_counter()
    parity = build(base)
    dt0, ref_out = timeit(parity)
    print(f"parity fp32: {dt0*1e3:6.2f} ms (compile {time.perf_counter()-t0:.0f}s)",
          flush=True)

    LADDER = [
        ("sht=bf16", dict(sht_mxu_dtype="bfloat16")),
        ("spectral=bf16+pallas", dict(spectral_mxu_dtype="bfloat16", use_pallas=True)),
        ("spectral=f32+pallas", dict(use_pallas=True)),
        ("compute=bf16", dict(compute_dtype="bfloat16")),
        ("film=bf16", dict(film=dataclasses.replace(base.film, compute_dtype="bfloat16"))),
        ("all-fast", dict(
            compute_dtype="bfloat16", use_pallas=True,
            spectral_mxu_dtype="bfloat16", sht_mxu_dtype="bfloat16",
            film=dataclasses.replace(base.film, compute_dtype="bfloat16"),
        )),
        ("fast-sht=f32", dict(
            compute_dtype="bfloat16", use_pallas=True,
            spectral_mxu_dtype="bfloat16",
            film=dataclasses.replace(base.film, compute_dtype="bfloat16"),
        )),
        ("fast-spectral=f32", dict(
            compute_dtype="bfloat16", use_pallas=True,
            sht_mxu_dtype="bfloat16",
            film=dataclasses.replace(base.film, compute_dtype="bfloat16"),
        )),
    ]
    for name, kw in LADDER:
        cfg = dataclasses.replace(base, **kw)
        t0 = time.perf_counter()
        c = build(cfg)
        dt, out = timeit(c)
        drift = float(rel(ref_out, out))
        print(
            f"{name:22s}: {dt*1e3:6.2f} ms  drift={drift:.2e} "
            f"(compile {time.perf_counter()-t0:.0f}s)",
            flush=True,
        )

    # fast config with bf16-stored params (serving_params): halves HBM
    # parameter reads (pos_embed = 1.06 GB fp32)
    from msfno_tpu.inference.rollout import serving_params
    from msfno_tpu.models import FourierNeuralOperatorNetFilmed

    cfg = dataclasses.replace(base, **dict(LADDER[5][1]))
    model = FourierNeuralOperatorNetFilmed(cfg)
    p_bf = jax.jit(lambda p: serving_params(p))(params)
    fn = lambda p, a, s: model.apply(p, a, s, 1.0)
    c = jax.jit(fn).lower(p_bf, *x).compile()
    out = c(p_bf, *x)
    float(jnp.sum(out[..., 0]))
    t0 = time.perf_counter()
    st = x[0]
    for _ in range(10):
        st = c(p_bf, st, x[1])
    float(jnp.sum(st[..., 0]))
    dt = (time.perf_counter() - t0) / 10
    drift = float(rel(ref_out, out))
    print(f"{'all-fast+bf16 params':22s}: {dt*1e3:6.2f} ms  drift={drift:.2e}",
          flush=True)


if __name__ == "__main__":
    main()
