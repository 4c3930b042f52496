"""A/B the fused encoder->spectral head (grid_encoder_spectral) on the real
chip: fast-tier dispatched + in-scan, plus single-step drift vs exact.

Usage: python tools/bench_encoder_fusion.py
"""

from __future__ import annotations

import dataclasses
import sys
import time


def rel_l2(a, b):
    import numpy as np

    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return float(((a - b) ** 2).sum() ** 0.5 / max((b**2).sum() ** 0.5, 1e-30))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from bench import _build, _time_chained
    from msfno_tpu.models import FourierNeuralOperatorNetFilmed

    cfg_on = ge._flagship_cfg(fast=True)
    cfg_off = dataclasses.replace(cfg_on, fuse_encoder_dft=False)
    cfg_exact = ge._flagship_cfg()
    assert cfg_on.fuse_encoder_dft

    # build -> time -> build -> time, never three resident programs before
    # the first execution: the back-to-back-builds variant of this script
    # wedged the tunnel twice on 2026-08-20 while bench.py's interleaved
    # pattern ran clean the same hour
    from bench import _arm_watchdog

    kick = _arm_watchdog(900)
    c_exact, params, x, sst = _build(cfg_exact)
    print("exact built", flush=True)
    state = c_exact(params, x, sst)
    y_exact = c_exact(params, state, sst)
    print("exact state ready", flush=True)
    kick()

    c_off, _, _, _ = _build(cfg_off, params=params)
    dt_off, _ = _time_chained(c_off, params, x, sst, 10)
    dt_off2, _ = _time_chained(c_off, params, x, sst, 10)
    y_off = c_off(params, state, sst)
    print(f"fast enc-unfused: {dt_off*1e3:.2f} / {dt_off2*1e3:.2f} ms",
          flush=True)
    kick()

    c_on, _, _, _ = _build(cfg_on, params=params)
    dt_on, _ = _time_chained(c_on, params, x, sst, 10)
    dt_on2, _ = _time_chained(c_on, params, x, sst, 10)
    y_on = c_on(params, state, sst)
    print(f"fast enc-fused:   {dt_on*1e3:.2f} / {dt_on2*1e3:.2f} ms",
          flush=True)
    kick()
    print(f"unfused vs exact: {rel_l2(y_off, y_exact):.3e}", flush=True)
    print(f"fused   vs exact: {rel_l2(y_on, y_exact):.3e}", flush=True)
    print(f"fused vs unfused: {rel_l2(y_on, y_off):.3e}", flush=True)

    # in-scan
    sst_seq = jax.jit(
        lambda s, k: s[None]
        + 0.01 * jax.random.normal(k, (32,) + s.shape, s.dtype)
    )(sst, jax.random.PRNGKey(2))
    for name, c in (("unfused", cfg_off), ("fused", cfg_on)):
        model = FourierNeuralOperatorNetFilmed(c)

        def _roll(p, x0, seq, model=model):
            def body(state, s):
                nxt = model.apply(p, state, s, 1.0)
                return nxt, jnp.sum(nxt[0, 0, :8, 0])

            _, outs = jax.lax.scan(body, x0, seq)
            return outs

        roll = jax.jit(_roll)
        t0 = time.perf_counter()
        float(jnp.sum(roll(params, x, sst_seq)))
        print(f"{name} scan build+warm {time.perf_counter()-t0:.1f}s",
              flush=True)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(roll(params, x, sst_seq)))
            best = min(best, (time.perf_counter() - t0) / 32)
        print(f"{name} in-scan: {best*1e3:.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
