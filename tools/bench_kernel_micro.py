#!/usr/bin/env python
"""Micro-bench: spectral-MLP kernel variants, chained INSIDE one jit program
via lax.scan (per-call dispatch over the axon tunnel is ~1.2 ms, which would
swamp ~1 ms kernels if chained at the Python level)."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import time

import jax
import jax.numpy as jnp

from msfno_tpu.ops.pallas import spectral_mlp as sm

N = 120 * 121
DIMS = [256, 512, 512, 512, 256]
FLOPS = sum(N * DIMS[i] * DIMS[i + 1] * 8 for i in range(4))
K = 50  # scan length


def timeit(name, step, x, flops=FLOPS):
    """step: x -> x (same shape); scans K times inside one program."""

    @jax.jit
    def run(v):
        out, _ = jax.lax.scan(lambda h, _: (step(h), None), v, None, length=K)
        return out

    out = run(x)
    float(jnp.sum(jnp.abs(out).astype(jnp.float32)))
    t0 = time.perf_counter()
    out = run(x)
    float(jnp.sum(jnp.abs(out).astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / K
    print(f"{name:28s}: {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TF/s", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    ws = []
    for i in range(4):
        key, k = jax.random.split(key)
        ws.append(0.02 * jax.random.normal(k, (DIMS[i], DIMS[i + 1], 2)))
    flat = []
    for w in ws:
        flat += [w[..., 0], w[..., 1]]

    n_pad = -N % 512
    x = jax.jit(lambda k: jax.random.normal(k, (N + n_pad, 2 * DIMS[0])))(key)

    for tile in (256, 512, 1024):
        def raw(v, _tile=tile):
            r, i = sm._packed_call(
                v[:, :256], v[:, 256:], *flat, mxu_dtype="bfloat16", tile_n=_tile
            )
            return jnp.concatenate([r, i], axis=1)

        timeit(f"packed kernel bf16 t={tile}", raw, x)

    def raw4(v):
        r, i = sm._fused_call(v[:, :256], v[:, 256:], *flat, mxu_dtype="bfloat16")
        return jnp.concatenate([r, i], axis=1)

    timeit("4dot kernel bf16 t=256", raw4, x)

    packed = []
    for w in ws:
        wr, wi = w[..., 0], w[..., 1]
        top = jnp.concatenate([wr, wi], axis=1)
        bot = jnp.concatenate([-wi, wr], axis=1)
        packed.append(jnp.concatenate([top, bot], axis=0).astype(jnp.bfloat16))

    def xla_chain(v):
        h = v
        for idx, w in enumerate(packed):
            h2 = jnp.dot(h.astype(jnp.bfloat16), w,
                         preferred_element_type=jnp.float32)
            if idx < 3:
                d = DIMS[idx + 1]
                col = jax.lax.broadcasted_iota(jnp.int32, h2.shape, 1)
                h2 = jnp.where((col < d) & (h2 < 0), 0.0, h2)
            h = h2
        return h

    timeit("xla packed chain bf16", xla_chain, x)

    # full wrapper (complex in/out)
    coeffs = jax.jit(
        lambda k: jax.lax.complex(
            jax.random.normal(k, (1, 120, 121, 256)),
            jax.random.normal(jax.random.fold_in(k, 1), (1, 120, 121, 256)),
        )
    )(key)

    @jax.jit
    def run_wrap(v):
        out, _ = jax.lax.scan(
            lambda h, _: (sm.spectral_mlp(h, ws, mxu_dtype="bfloat16"), None),
            v, None, length=K,
        )
        return out

    out = run_wrap(coeffs)
    float(jnp.sum(jnp.abs(out).astype(jnp.float32)))
    t0 = time.perf_counter()
    out = run_wrap(coeffs)
    float(jnp.sum(jnp.abs(out).astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / K
    print(f"{'full wrapper bf16':28s}: {dt*1e3:7.3f} ms  {FLOPS/dt/1e12:6.1f} TF/s",
          flush=True)

    # MXU ceiling
    m = jax.jit(lambda k: jax.random.normal(k, (1024, 1024), jnp.bfloat16))(key)
    a = jax.jit(lambda k: jax.random.normal(k, (N + n_pad, 1024), jnp.bfloat16))(key)

    def big(v):
        h = v
        for _ in range(4):
            h = jnp.dot(h, m)
        return h

    big_flops = 4 * (N + n_pad) * 1024 * 1024 * 2
    timeit("4x (14848,1024)@(1024,1024)", big, a, flops=big_flops)


if __name__ == "__main__":
    main()
