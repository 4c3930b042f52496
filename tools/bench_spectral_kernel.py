#!/usr/bin/env python
"""A/B the Pallas spectral-MLP kernels at flagship size on TPU.

Compares the original 4-dot kernel vs the packed double-width kernel
(spectral_mlp.PACKED) across mxu dtypes and tile sizes.  Chained timing per
axon rules (fetch one scalar at the end)."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import time

import jax
import jax.numpy as jnp

from msfno_tpu.ops.pallas import spectral_mlp as sm

N = 120 * 121  # flagship retained modes
DIMS = [256, 512, 512, 512, 256]
ITERS = 20


def main():
    key = jax.random.PRNGKey(0)
    ws = []
    for i in range(4):
        key, k = jax.random.split(key)
        ws.append(0.02 * jax.random.normal(k, (DIMS[i], DIMS[i + 1], 2)))
    coeffs = jax.jit(
        lambda k: jax.lax.complex(
            jax.random.normal(k, (1, 120, 121, DIMS[0])),
            jax.random.normal(jax.random.fold_in(k, 1), (1, 120, 121, DIMS[0])),
        )
    )(key)

    flops = 0
    d_in = DIMS[0]
    for d_out in DIMS[1:]:
        flops += N * d_in * d_out * 8
        d_in = d_out

    def run(packed, mxu, tile, karatsuba=False):
        sm.PACKED = packed
        sm.KARATSUBA = karatsuba
        f = jax.jit(lambda v: sm.spectral_mlp(v, ws, mxu_dtype=mxu))
        out = f(coeffs)
        float(jnp.sum(jnp.abs(out)))
        t0 = time.perf_counter()
        x = coeffs
        for _ in range(ITERS):
            x = f(x)
        float(jnp.sum(jnp.abs(x)))
        dt = (time.perf_counter() - t0) / ITERS
        kind = "karat " if karatsuba else ("packed" if packed else "4dot  ")
        name = f"{kind} {mxu:9s} tile={tile}"
        print(f"{name}: {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TF/s", flush=True)
        return dt

    for tile in (256, 512, 1024):
        import importlib
        # tile is a static arg of _packed_call via spectral_mlp? patch default
        orig = sm._packed_call
        sm.PACKED = True
        # re-wrap with tile override
        import functools
        def patched(xr, xi, *flat_ws, negative_slope=0.0, interpret=False,
                    mxu_dtype="float32", _orig=orig, _tile=tile):
            return _orig(xr, xi, *flat_ws, negative_slope=negative_slope,
                         interpret=interpret, mxu_dtype=mxu_dtype, tile_n=_tile)
        sm._packed_call = patched
        for mxu in ("bfloat16", "float32"):
            run(True, mxu, tile)
        sm._packed_call = orig
    for mxu in ("bfloat16", "float32"):
        run(False, mxu, 256)

    # Karatsuba 3-GEMM variant (3/4 the MXU FLOPs; tile set in the call)
    for tile in (256, 512):
        orig_k = sm._karatsuba_call

        def patched_k(xr, xi, *flat_ws, negative_slope=0.0, interpret=False,
                      mxu_dtype="float32", _orig=orig_k, _tile=tile):
            return _orig(xr, xi, *flat_ws, negative_slope=negative_slope,
                         interpret=interpret, mxu_dtype=mxu_dtype,
                         tile_n=_tile)

        sm._karatsuba_call = patched_k
        for mxu in ("bfloat16",):
            run(True, mxu, tile, karatsuba=True)
        sm._karatsuba_call = orig_k

    # numeric check: karatsuba vs packed (same mxu tier)
    sm.PACKED, sm.KARATSUBA = True, False
    ref = jax.jit(lambda v: sm.spectral_mlp(v, ws, mxu_dtype="bfloat16"))(coeffs)
    sm.KARATSUBA = True
    kar = jax.jit(lambda v: sm.spectral_mlp(v, ws, mxu_dtype="bfloat16"))(coeffs)
    sm.KARATSUBA = False
    import numpy as np
    r = np.asarray(jnp.abs(kar - ref)).max() / max(
        float(jnp.abs(ref).max()), 1e-30
    )
    print(f"karatsuba vs packed max-rel {r:.3e}", flush=True)


if __name__ == "__main__":
    main()
