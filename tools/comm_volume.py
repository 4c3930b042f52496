"""Extract the sharded-SHT all_to_all payload shapes from the FULL-SIZE
721x1440 train-step jaxpr on the virtual 8-device CPU mesh (trace only, no
compile), and print the per-shard comm-volume table behind BASELINE.md's
"Round-5 comm volume" section.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python tools/comm_volume.py
(or let the module set them itself, as below).
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import sys
from collections import Counter

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_fullsize_lowering import _collective_shapes, _flagship_cfg
from msfno_tpu.parallel import make_mesh, make_sharded_train_step
from msfno_tpu.training.trainer import Trainer
from msfno_tpu.utils.config import TrainConfig

ITEM = {"f32": 4, "bf16": 2, "f16": 2, "c64": 8}


def main() -> None:
    for shape in [(2, 2, 2), (1, 4, 2)]:
        mesh = make_mesh(8, shape=shape)
        cfg = _flagship_cfg()
        tcfg = TrainConfig(batch_size=1, film_scale_start=1.0)
        trainer = Trainer(cfg, tcfg)
        state_abs = jax.eval_shape(
            trainer._init_state_impl, jax.random.PRNGKey(0)
        )
        s = tcfg.multi_step_training + 2
        h, w = cfg.img_size
        f = cfg.film
        era5 = jax.ShapeDtypeStruct((s, 1, h, w, cfg.in_chans), jnp.float32)
        sst = jax.ShapeDtypeStruct(
            (s, 1, f.temporal_step, *f.sst_shape), jnp.float32
        )
        step, _ = make_sharded_train_step(trainer, mesh)
        text = str(step.trace(state_abs, era5, sst).jaxpr)
        cnt = Counter(_collective_shapes(text))
        print(f"\n== mesh {shape} (train step, batch 1, S={s}):")
        tot = 0
        for (op, dt, dims), n in sorted(cnt.items(), key=lambda kv: -kv[1]):
            b = ITEM[dt]
            for d in dims.split(","):
                if d:
                    b *= int(d)
            if op == "all_to_all":
                tot += n * b
            print(f"  {op:12s} {dt}[{dims}] x{n}  ({b/1e6:.2f} MB/shard)")
        print(f"  total all_to_all per-shard: {tot/1e6:.1f} MB/step")


if __name__ == "__main__":
    main()
