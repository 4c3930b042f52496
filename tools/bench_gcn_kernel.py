"""A/B the fused GCN-layer kernel (ops/pallas/gcn_layer.py) on the real
chip: isolated generator latency (bf16 and fp32 numerics classes), the full
fast-tier step, and single-step drift.

Usage: python tools/bench_gcn_kernel.py
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
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from bench import _build, _time_chained
    from msfno_tpu.data.synthetic import synthetic_land_mask
    from msfno_tpu.models.film.gcn import GCNFilmGenerator

    # ---- isolated generator: 7-layer gcn_custom at film scale ----
    hs, ws = 180, 360
    sst_np = np.random.default_rng(0).standard_normal(
        (1, 28, hs, ws)
    ).astype(np.float32)
    sst_np[..., synthetic_land_mask(hs, ws)] = np.nan
    sst = jnp.asarray(sst_np)

    for dt_name in ("bfloat16", "float32"):
        outs = {}
        for fused in (False, True):
            gen = GCNFilmGenerator(
                512, embed_dim=512, depth=6, custom=True,
                dtype=jnp.dtype(dt_name), use_pallas=fused,
            )
            params = jax.jit(gen.init)(jax.random.PRNGKey(0), sst)

            # 16 chained applications inside ONE program (per-call dispatch
            # timing over the tunnel is unusable — axon rules)
            def chain(p, s):
                def body(carry, _):
                    o = gen.apply(p, s + 0.0 * carry[0, 0])
                    return o, ()

                o0 = gen.apply(p, s)
                out, _ = jax.lax.scan(body, o0, None, length=15)
                return out

            f = jax.jit(chain)
            t0 = time.perf_counter()
            f(params, sst).block_until_ready()
            print(f"gen {dt_name} fused={fused}: build "
                  f"{time.perf_counter()-t0:.1f}s", flush=True)
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                f(params, sst).block_until_ready()
                best = min(best, (time.perf_counter() - t0) / 16)
            print(f"gen {dt_name} fused={fused}: {best*1e3:.2f} ms",
                  flush=True)
            g1 = jax.jit(lambda p, s: gen.apply(p, s))
            outs[fused] = g1(params, sst)
        print(f"gen {dt_name} fused-vs-unfused rel-L2 "
              f"{rel_l2(outs[True], outs[False]):.3e}", flush=True)

    # ---- full fast-tier step ----
    cfg_on = ge._flagship_cfg(fast=True)
    cfg_off = dataclasses.replace(
        cfg_on, film=dataclasses.replace(cfg_on.film, pallas_gcn=False)
    )
    c_off, params, x, sst = _build(cfg_off)
    c_on, _, _, _ = _build(cfg_on, params=params)
    dt_off, out_off = _time_chained(c_off, params, x, sst, 10)
    dt_on, out_on = _time_chained(c_on, params, x, sst, 10)
    dt_off2, _ = _time_chained(c_off, params, x, sst, 10)
    dt_on2, _ = _time_chained(c_on, params, x, sst, 10)
    print(f"fast step gcn-unfused: {dt_off*1e3:.2f} / {dt_off2*1e3:.2f} ms",
          flush=True)
    print(f"fast step gcn-fused:   {dt_on*1e3:.2f} / {dt_on2*1e3:.2f} ms",
          flush=True)

    y_off = c_off(params, x, sst)
    y_on = c_on(params, x, sst)
    print(f"single-step fused vs unfused rel-L2 {rel_l2(y_on, y_off):.3e}",
          flush=True)


if __name__ == "__main__":
    main()
