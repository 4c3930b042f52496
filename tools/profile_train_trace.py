"""XLA-profiler trace of the CACHED scan-chained train step (bench.py's
train_steps program, K=8) — per-op device times for the fine-tune budget.

Usage: python tools/profile_train_trace.py [outdir]
Then:  python tools/xplane_parse.py <outdir> --top 60   (divide by 16 steps)
"""

from __future__ import annotations

import dataclasses
import sys
import time


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax-trace-train"

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    from msfno_tpu.data.synthetic import gen_batch
    from msfno_tpu.training.trainer import Trainer
    from msfno_tpu.utils.config import TrainConfig

    tcfg = TrainConfig(batch_size=1, film_scale_start=1.0,
                       bf16_frozen_params=True)
    cfg = dataclasses.replace(
        __graft_entry__._flagship_cfg(fast=True), checkpointing_block=False
    )
    trainer = Trainer(cfg, tcfg)
    t0 = time.perf_counter()
    state = trainer.init_state()
    print(f"init {time.perf_counter()-t0:.1f}s", flush=True)
    b = gen_batch(cfg, 1, 0, seed=0)
    era5 = jnp.asarray(b.era5)
    sst = jnp.asarray(b.sst)
    k = 8
    era5_k = jnp.broadcast_to(era5[None], (k,) + era5.shape)
    sst_k = jnp.broadcast_to(sst[None], (k,) + sst.shape)

    t0 = time.perf_counter()
    state, m = trainer.train_steps(state, era5_k, sst_k)
    float(m["loss"][-1])
    print(f"build+warm {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    with jax.profiler.trace(outdir):
        state, m = trainer.train_steps(state, era5_k, sst_k)
        state, m = trainer.train_steps(state, era5_k, sst_k)
        float(m["loss"][-1])
    dt = (time.perf_counter() - t0) / (2 * k)
    print(f"traced 2x{k} steps at {dt*1e3:.2f} ms/step", flush=True)
    print(f"trace in {outdir}", flush=True)


if __name__ == "__main__":
    main()
