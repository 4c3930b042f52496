#!/usr/bin/env python
"""A/B the spectral-MLP backward at flagship size on TPU.

Times grad-through-the-stack (input cotangent only, frozen weights — the film
fine-tuning shape) with the fused Pallas backward kernel vs the jnp-reference
VJP fallback.  Chained scan timing per axon rules (one scalar fetch)."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import time

import jax
import jax.numpy as jnp

from msfno_tpu.ops.pallas import spectral_mlp as sm

N_LAT, N_M = 120, 121
DIMS = [256, 512, 512, 512, 256]
K = 20


def main():
    key = jax.random.PRNGKey(0)
    ws = []
    for i in range(4):
        key, k = jax.random.split(key)
        ws.append(0.02 * jax.random.normal(k, (DIMS[i], DIMS[i + 1], 2)))
    coeffs = jax.jit(
        lambda k: jax.lax.complex(
            jax.random.normal(k, (1, N_LAT, N_M, DIMS[0])),
            jax.random.normal(jax.random.fold_in(k, 1), (1, N_LAT, N_M, DIMS[0])),
        )
    )(key)

    n = N_LAT * N_M
    flops_fwd = 0
    d_in = DIMS[0]
    for d_out in DIMS[1:]:
        flops_fwd += n * d_in * d_out * 8
        d_in = d_out

    def run(label, pallas_bwd):
        sm.PALLAS_BWD = pallas_bwd

        @jax.jit
        def scan_grad(x0):
            def body(x, _):
                def loss(v):
                    out = sm.spectral_mlp(v, ws, mxu_dtype="bfloat16")
                    return jnp.sum(jnp.abs(out) ** 2) * 1e-12

                g = jax.grad(loss)(x)
                return x + g.astype(x.dtype) * 1e-20, ()

            return jax.lax.scan(body, x0, None, length=K)[0]

        t0 = time.perf_counter()
        out = scan_grad(coeffs)
        float(jnp.sum(jnp.abs(out)))
        print(f"{label}: compile+first {time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        out = scan_grad(out)
        float(jnp.sum(jnp.abs(out)))
        dt = (time.perf_counter() - t0) / K
        # fwd (Pallas) + bwd(recompute+dx): ~3x fwd flops total in the graph
        print(
            f"{label}: {dt*1e3:7.3f} ms/iter  ({3*flops_fwd/dt/1e12:5.1f} TF/s eff)",
            flush=True,
        )
        return dt

    t_jnp = run("jnp-vjp  bwd", False)
    t_pal = run("pallas   bwd", True)
    print(f"speedup: {t_jnp / t_pal:.2f}x", flush=True)


if __name__ == "__main__":
    main()
