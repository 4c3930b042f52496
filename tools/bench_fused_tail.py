"""A/B the fused spectral->output decoder tail (ops/pallas/spectral_decoder)
on the real chip: fast tier, full 721x1440 filmed step, 10-iter chained,
plus numeric drift of the fused path vs the unfused fast tier and vs the
exact tier.

Usage: python tools/bench_fused_tail.py [--scan]
"""

from __future__ import annotations

import dataclasses
import sys
import time


def rel_l2(a, b):
    import numpy as np

    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return float(
        (((a - b) ** 2).sum() ** 0.5) / max((b**2).sum() ** 0.5, 1e-30)
    )


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from bench import _build, _time_chained

    cfg_on = ge._flagship_cfg(fast=True)
    cfg_off = dataclasses.replace(cfg_on, fuse_decoder_tail=False)
    assert cfg_on.fuse_decoder_tail

    t0 = time.perf_counter()
    c_off, params, x, sst = _build(cfg_off)
    print(f"unfused build {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    c_on, _, _, _ = _build(cfg_on, params=params)
    print(f"fused build {time.perf_counter()-t0:.1f}s", flush=True)

    dt_off, out_off = _time_chained(c_off, params, x, sst, 10)
    dt_on, out_on = _time_chained(c_on, params, x, sst, 10)
    print(f"fast tier unfused: {dt_off*1e3:.2f} ms", flush=True)
    print(f"fast tier fused:   {dt_on*1e3:.2f} ms", flush=True)
    print(f"fused vs unfused rel-L2 {rel_l2(out_on, out_off):.3e}", flush=True)

    # second pass to check run-to-run variance
    dt_off2, _ = _time_chained(c_off, params, x, sst, 10)
    dt_on2, _ = _time_chained(c_on, params, x, sst, 10)
    print(f"repeat: unfused {dt_off2*1e3:.2f} ms, fused {dt_on2*1e3:.2f} ms",
          flush=True)

    if "--scan" in sys.argv:
        def mk_roll(compiled_cfg):
            from msfno_tpu.models import FourierNeuralOperatorNetFilmed

            model = FourierNeuralOperatorNetFilmed(compiled_cfg)

            def _roll(p, x0, sst_seq):
                def body(state, s):
                    nxt = model.apply(p, state, s, 1.0)
                    return nxt, jnp.sum(nxt[0, 0, :8, 0])

                _, outs = jax.lax.scan(body, x0, sst_seq)
                return outs

            return jax.jit(_roll)

        sst_seq = jax.jit(
            lambda s, k: s[None]
            + 0.01 * jax.random.normal(k, (32,) + s.shape, s.dtype)
        )(sst, jax.random.PRNGKey(2))
        for name, c in (("unfused", cfg_off), ("fused", cfg_on)):
            roll = mk_roll(c)
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
