#!/usr/bin/env python
"""Compiled-program HBM footprint of the flagship paths (XLA memory_analysis).

Reports, for the full-size 721x1440 filmed SFNO:
  - inference forward (fast + exact tiers)
  - fine-tuning train step (film-only grads, no remat)
the XLA-reported argument/output/temp/peak sizes.  The reference pins its
whole training fit at ~28 GB GPU memory for the same model scale
(SURVEY.md perf notes); the numbers here are the TPU-side equivalent and
bound what batch sizes / rollout horizons fit in 16 GB v5e HBM.

Lowering only — no step is executed, so this is safe to run even when the
device is busy.  On CPU backends a tiny config is used as a smoke test.

Usage: python tools/mem_analysis.py
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import json


def _fmt(n):
    return round(n / 2**30, 3)


def _mem(compiled):
    ma = compiled.memory_analysis()
    if ma is None:
        return {}
    out = {}
    for k in (
        "argument_size_in_bytes",
        "output_size_in_bytes",
        "temp_size_in_bytes",
        "generated_code_size_in_bytes",
        "peak_memory_in_bytes",
    ):
        v = getattr(ma, k, None)
        if v:
            out[k.replace("_in_bytes", "_gib")] = _fmt(v)
    # alias_size counts donated/aliased buffers (params in the train step)
    v = getattr(ma, "alias_size_in_bytes", None)
    if v:
        out["alias_size_gib"] = _fmt(v)
    return out


def main():
    import jax

    if "--cpu" in sys.argv or os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon sitecustomize pins jax_platforms="axon,cpu" over the env
        from msfno_tpu.cli import _force_cpu_backend

        _force_cpu_backend()
    import jax.numpy as jnp

    import __graft_entry__
    from msfno_tpu.data.synthetic import gen_batch
    from msfno_tpu.models.sfno.sfnonet import FourierNeuralOperatorNetFilmed
    from msfno_tpu.training.trainer import Trainer
    from msfno_tpu.utils.config import TrainConfig

    tiny = jax.default_backend() == "cpu"
    report = {"backend": jax.default_backend(), "tiny": tiny}

    for tier, kw in (("fast", {"fast": True}), ("exact", {})):
        cfg = __graft_entry__._flagship_cfg(tiny=tiny, **kw)
        model = FourierNeuralOperatorNetFilmed(cfg)
        h, w = cfg.img_size
        x = jax.ShapeDtypeStruct((1, h, w, cfg.in_chans), jnp.float32)
        hs, ws = cfg.film.sst_shape
        sst = jax.ShapeDtypeStruct(
            (1, cfg.film.temporal_step, hs, ws), jnp.float32)
        params = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, sst)
        fwd = jax.jit(lambda p, x, s: model.apply(p, x, s, 1.0))
        compiled = fwd.lower(params, x, sst).compile()
        report[f"forward_{tier}"] = _mem(compiled)

    cfg = __graft_entry__._flagship_cfg(tiny=tiny, fast=True)
    import dataclasses
    cfg = dataclasses.replace(cfg, checkpointing_block=False)
    tcfg = TrainConfig(batch_size=1, film_scale_start=1.0)
    trainer = Trainer(cfg, tcfg)
    # abstract shapes only — a concrete full-res batch would be a ~580 MiB
    # host->device upload through the slow relay for a lowering that never
    # executes (axon rule: keep bulk data off the tunnel)
    batch = gen_batch(cfg, 1, 0, seed=0)
    era5 = jax.ShapeDtypeStruct(batch.era5.shape, jnp.float32)
    sst = (jax.ShapeDtypeStruct(batch.sst.shape, jnp.float32)
           if batch.sst is not None else None)
    state_shape = jax.eval_shape(trainer.init_state)
    compiled = jax.jit(trainer._train_step_impl).lower(
        state_shape, era5, sst).compile()
    report["train_step_fast"] = _mem(compiled)

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
