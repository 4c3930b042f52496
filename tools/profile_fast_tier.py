"""Capture an XLA profiler trace of the CACHED fast-tier step and print the
per-op breakdown.

Rationale (BASELINE.md round-4 note): the axon tunnel's remote-compile
service kills newly-composed K-step programs, but CACHED programs run
normally — and the fast-tier step is in the persistent compile cache from
bench.py.  jax.profiler.trace around already-compiled dispatches needs no
new compilation, so this sidesteps the blocked tools/profile_parts.py path
and yields the first measured (not arithmetic) component budget since
round 1.

Usage: python tools/profile_fast_tier.py [outdir] [--train] [--iters N]
Then:  python tools/xplane_parse.py <outdir>
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    args = sys.argv[1:]
    outdir = "/tmp/jax-trace-fast"
    iters = 6
    train = "--train" in args
    if "--iters" in args:
        i = args.index("--iters")
        iters = int(args[i + 1])
        del args[i : i + 2]
    pos = [a for a in args if not a.startswith("--")]
    if pos:
        outdir = pos[0]

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from bench import _build, _time_chained

    cfg = ge._flagship_cfg(fast=True)
    t0 = time.perf_counter()
    compiled, params, x, sst = _build(cfg)
    print(f"build (cache-hit) {time.perf_counter()-t0:.1f}s", flush=True)

    if train:
        from tools.bench_train_step import build_train  # type: ignore

        raise SystemExit("use tools/profile_train_step.py for the train step")

    # warm: one dispatch + sync outside the trace
    out = compiled(params, x, sst)
    float(jnp.sum(out[..., 0]))
    t0 = time.perf_counter()
    with jax.profiler.trace(outdir):
        state = x
        for _ in range(iters):
            state = compiled(params, state, sst)
        float(jnp.sum(state[..., 0]))
    dt = (time.perf_counter() - t0) / iters
    print(f"traced {iters} dispatched steps at {dt*1e3:.2f} ms/step", flush=True)
    print(f"trace in {outdir}; parse with tools/xplane_parse.py", flush=True)


if __name__ == "__main__":
    main()
