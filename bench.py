"""Benchmark: flagship MSFNO 6h forward step at full ERA5 resolution.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numeric speed for this model (BASELINE.md); its
only forward-speed datapoints are anecdotal comments (GCN film generator
alone ~3.3 s/batch on a V100-class GPU, MSFNO/Models/train.py:1567-1568).
We therefore anchor vs_baseline at 1.0 step/s for the full filmed forward —
i.e. vs_baseline == measured steps/s — and additionally report achieved
FLOP/s utilization on stderr for the speed-of-light tracking required by
BASELINE.json.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    try:  # persistent compile cache: repeat runs skip the slow first compile
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)

    import __graft_entry__

    if on_tpu:
        fn, example_args = __graft_entry__.entry()
        label = "msfno_6h_step_721x1440"
    else:
        # CPU fallback so the bench always produces a line
        from msfno_tpu.models import FourierNeuralOperatorNetFilmed
        from msfno_tpu.data.synthetic import gen_batch

        cfg = __graft_entry__._flagship_cfg(tiny=True)
        model = FourierNeuralOperatorNetFilmed(cfg)
        b = gen_batch(cfg, 1, 0, seed=0)
        x = jnp.asarray(b.era5[0])
        sst = jnp.asarray(b.sst[0])
        params = model.init(jax.random.PRNGKey(0), x, sst)
        fn = lambda params, x, sst: model.apply(params, x, sst, 1.0)
        example_args = (params, x, sst)
        label = "msfno_6h_step_tiny_cpu"

    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    lowered = jfn.lower(*example_args)
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get("flops")
    except Exception:
        pass

    # warmup (fetch a scalar: on the axon platform block_until_ready does
    # not reliably block, so force a device->host readback)
    params, x, sst = example_args
    out = compiled(params, x, sst)
    float(jnp.sum(out[..., 0]))

    # timed: chain the step autoregressively (out feeds the next input, the
    # real rollout pattern) so iterations cannot overlap, then fetch once
    iters = 10 if on_tpu else 3
    t0 = time.perf_counter()
    state = x
    for _ in range(iters):
        state = compiled(params, state, sst)
    float(jnp.sum(state[..., 0]))
    dt = (time.perf_counter() - t0) / iters

    steps_per_sec = 1.0 / dt
    info = {
        "compile_s": round(compile_s, 2),
        "latency_ms": round(dt * 1e3, 3),
        "backend": backend,
    }
    if flops:
        achieved = flops / dt
        info["model_tflops"] = round(flops / 1e12, 3)
        info["achieved_tflops_per_s"] = round(achieved / 1e12, 2)
        # TPU v5e peak ~197 bf16 TFLOP/s
        if on_tpu:
            info["fraction_of_v5e_peak"] = round(achieved / 197e12, 4)
    print(json.dumps(info), file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": label + "_steps_per_sec",
                "value": round(steps_per_sec, 4),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / 1.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
