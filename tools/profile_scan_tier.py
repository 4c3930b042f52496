"""Trace the CACHED in-scan fast-tier rollout (bench.py's _roll program) —
the program behind the headline steps/s — and print per-op times.

Same rationale as tools/profile_fast_tier.py: the program is in the
persistent compile cache, so no fresh remote compile is needed.

Usage: python tools/profile_scan_tier.py [outdir]
Then:  python tools/xplane_parse.py <outdir>   (divide by 32 steps)
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax-trace-scan"

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from bench import _build
    from msfno_tpu.models import FourierNeuralOperatorNetFilmed

    cfg = ge._flagship_cfg(fast=True)
    t0 = time.perf_counter()
    compiled, params, x, sst = _build(cfg)
    print(f"fast build (cache-hit) {time.perf_counter()-t0:.1f}s", flush=True)
    model = FourierNeuralOperatorNetFilmed(cfg)

    def _roll(params, x0, sst_seq):
        def body(state, s):
            nxt = model.apply(params, state, s, 1.0)
            # tiny-slice chain dependency, matching bench.py's scan body
            # (the old full-field mean cost 0.7 ms/step of pure read)
            return nxt, jnp.mean(nxt[0, :8, :128, 0])

        _, means = jax.lax.scan(body, x0, sst_seq)
        return means

    _mk_seq = jax.jit(
        lambda s, k: s[None]
        + 0.01 * jax.random.normal(k, (32,) + s.shape, s.dtype)
    )
    sst_seq = _mk_seq(sst, jax.random.PRNGKey(2))
    jroll = jax.jit(_roll)
    t0 = time.perf_counter()
    float(jnp.sum(jroll(params, x, sst_seq)))  # compile (cache hit) + warm
    print(f"scan build+warm {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    with jax.profiler.trace(outdir):
        float(jnp.sum(jroll(params, x, sst_seq)))
    dt = (time.perf_counter() - t0) / 32
    print(f"traced 32 in-scan steps at {dt*1e3:.2f} ms/step", flush=True)
    print(f"trace in {outdir}; parse with tools/xplane_parse.py", flush=True)


if __name__ == "__main__":
    main()
