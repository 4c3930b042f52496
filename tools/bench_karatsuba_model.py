"""A/B the Karatsuba 3-GEMM spectral-MLP kernel inside the full fast-tier
in-scan step (the only timing venue the tunnel cannot distort).

Usage: python tools/bench_karatsuba_model.py
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from bench import _build
    from msfno_tpu.models import FourierNeuralOperatorNetFilmed
    from msfno_tpu.ops.pallas import spectral_mlp as sm

    cfg = ge._flagship_cfg(fast=True)
    compiled, params, x, sst = _build(cfg)
    model = FourierNeuralOperatorNetFilmed(cfg)
    sst_seq = jax.jit(
        lambda s, k: s[None]
        + 0.01 * jax.random.normal(k, (32,) + s.shape, s.dtype)
    )(sst, jax.random.PRNGKey(2))

    def mk_roll():
        def _roll(p, x0, seq):
            def body(state, s):
                nxt = model.apply(p, state, s, 1.0)
                return nxt, jnp.sum(nxt[0, 0, :8, 0])

            _, outs = jax.lax.scan(body, x0, seq)
            return outs

        return jax.jit(_roll)

    outs = {}
    for kar in (False, True):
        sm.KARATSUBA = kar
        roll = mk_roll()
        t0 = time.perf_counter()
        outs[kar] = np.asarray(roll(params, x, sst_seq))
        print(f"karatsuba={kar}: build+warm {time.perf_counter()-t0:.1f}s",
              flush=True)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            roll(params, x, sst_seq).block_until_ready()
            best = min(best, (time.perf_counter() - t0) / 32)
        print(f"karatsuba={kar}: {best*1e3:.2f} ms/step in-scan", flush=True)
    sm.KARATSUBA = False
    d = np.abs(outs[True] - outs[False]).max()
    s = np.abs(outs[False]).max()
    print(f"chain-probe max abs diff {d:.3e} (scale {s:.3e})", flush=True)


if __name__ == "__main__":
    main()
