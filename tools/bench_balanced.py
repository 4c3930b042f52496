#!/usr/bin/env python
"""Balanced-tier optimization sweep (VERDICT r2 item 3).

The balanced tier (fp32 activations, DEFAULT-precision matmuls = bf16 MXU
inputs with fp32 accumulation) is the recommended scientific configuration
but has had no optimization pass: 45.5 ms vs the fast tier's 37.1 ms.  This
sweep times balanced-tier variants that keep the same numerics class
(fp32 activations everywhere; only MXU input rounding differs) and reports
each variant's single-step rel-L2 against the exact (HIGHEST) tier so any
win is evidence-cleared before flipping `_flagship_cfg(balanced=True)`:

  base    balanced as shipped (XLA spectral path, fp32 film generator)
  sp      + fused Pallas spectral-MLP kernel (bf16 MXU, fp32 accumulate —
          the same contraction numerics the XLA path already runs under
          DEFAULT precision)
  gmlp32  + fused grid-MLP kernel with f32 MXU inputs (pure fusion delta;
          the bf16-MXU variant measured as noise on 2026-08-19)
  film16  + bf16 film generator activations (numerics CHANGE in the
          generator only; the film head stays fp32 — check rel-L2)
  all     sp + gmlp32 + film16

Chained timing, explicit-argument jits, persistent compile cache (axon
tunnel rules — see bench.py).  Usage:
  python tools/bench_balanced.py [iters] [stage ...]
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import dataclasses
import time


def main(iters: int = 10, stages=None):
    import jax
    import jax.numpy as jnp
    import __graft_entry__
    from bench import _build, _time_chained

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    base = __graft_entry__._flagship_cfg(balanced=True)
    variants = {
        "base": base,
        "sp": dataclasses.replace(base, use_pallas=True,
                                  spectral_mxu_dtype="bfloat16"),
        "gmlp32": dataclasses.replace(base, pallas_grid_mlp=True,
                                      grid_mlp_mxu_dtype="float32"),
        "film16": dataclasses.replace(
            base, film=dataclasses.replace(base.film, compute_dtype="bfloat16")
        ),
        "all": dataclasses.replace(
            base, use_pallas=True, spectral_mxu_dtype="bfloat16",
            pallas_grid_mlp=True, grid_mlp_mxu_dtype="float32",
            film=dataclasses.replace(base.film, compute_dtype="bfloat16"),
        ),
    }
    # the reverse experiment: the fast tier with the film generator back in
    # fp32 — the 2026-08-19 sweep showed film bf16 alone doubles balanced's
    # rel-L2 to 1.59e-2 (≈ the whole fast tier's 1.44e-2), so an fp32 film
    # on the otherwise-bf16 fast path may buy balanced-class accuracy at
    # near-fast latency
    fast = __graft_entry__._flagship_cfg(fast=True)
    variants["fast-film32"] = dataclasses.replace(
        fast, film=dataclasses.replace(fast.film, compute_dtype="float32")
    )
    variants["fast-ref"] = fast  # re-timed here so the comparison shares a run
    stages = stages or list(variants)
    for s in stages:
        if s not in variants:
            raise SystemExit(f"unknown stage {s!r}; choose from {list(variants)}")

    # exact-tier oracle output for rel-L2 (params shared across all variants)
    t0 = time.perf_counter()
    exact_c, params, x, sst = _build(__graft_entry__._flagship_cfg())
    y_exact = exact_c(params, x, sst)
    float(jnp.sum(y_exact[..., 0]))
    print(f"exact oracle ready in {time.perf_counter() - t0:.1f}s", flush=True)
    rel = jax.jit(lambda a, b: jnp.linalg.norm(a - b) / jnp.linalg.norm(a))

    for name in stages:
        cfg = variants[name]
        t0 = time.perf_counter()
        comp, _, _, _ = _build(cfg, params=params)
        print(f"== balanced/{name} (compile {time.perf_counter() - t0:.1f}s) ==",
              flush=True)
        dt, _ = _time_chained(comp, params, x, sst, iters)
        r = float(rel(y_exact, comp(params, x, sst)))
        print(f"  step: {dt * 1e3:6.2f} ms ({1 / dt:.1f} steps/s)"
              f"   rel-L2 vs exact: {r:.2e}", flush=True)


if __name__ == "__main__":
    argv = sys.argv[1:]
    n = int(argv[0]) if argv and argv[0].isdigit() else 10
    rest = argv[1:] if argv and argv[0].isdigit() else argv
    main(n, rest or None)
