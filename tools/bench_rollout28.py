#!/usr/bin/env python
"""28-day autoregressive S2S rollout at full resolution on TPU
(BASELINE.json config 4): 112 x 6h steps, HBM-resident state, streaming only
a channel subset to host, finiteness checked per step."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import time

import numpy as np


def main(days: int = 28):
    import jax
    import jax.numpy as jnp

    import __graft_entry__
    from msfno_tpu.data.synthetic import synthetic_land_mask
    from msfno_tpu.inference.rollout import RolloutConfig, rollout
    from msfno_tpu.models import FourierNeuralOperatorNetFilmed
    from msfno_tpu.models.variables import channel_index

    cfg = __graft_entry__._flagship_cfg(fast=True)
    model = FourierNeuralOperatorNetFilmed(cfg)
    h, w = cfg.img_size
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((1, h, w, cfg.in_chans)).astype(np.float32)
    f = cfg.film
    steps = days * 4
    sst_seq = rng.standard_normal(
        (steps, 1, f.temporal_step, *f.sst_shape)
    ).astype(np.float32)
    sst_seq[..., synthetic_land_mask(*f.sst_shape)] = np.nan

    t0 = time.perf_counter()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(x0), jnp.asarray(sst_seq[0])
    )["params"]
    print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)

    collect = [channel_index("2t"), channel_index("msl")]
    t0 = time.perf_counter()
    fields = []
    for i, field in enumerate(
        rollout(
            model,
            params,
            x0,
            RolloutConfig(steps=steps, collect_channels=collect),
            sst_seq=sst_seq,
        )
    ):
        assert np.all(np.isfinite(field)), f"non-finite at step {i}"
        fields.append(field.mean())
        if i == 0:
            print(f"first step (incl. compile): {time.perf_counter()-t0:.1f}s",
                  flush=True)
            t0 = time.perf_counter()
    dt = time.perf_counter() - t0
    print(
        f"{days}-day rollout: {steps - 1} further steps in {dt:.2f}s "
        f"({dt / (steps - 1) * 1e3:.1f} ms/step incl. host streaming)",
        flush=True,
    )
    print(f"t2m field means drifted {fields[0]:.3f} -> {fields[-1]:.3f}", flush=True)


if __name__ == "__main__":
    main()
