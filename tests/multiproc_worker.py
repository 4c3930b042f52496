"""Worker for the REAL two-process distributed test (test_multiprocess.py).

Each process: jax.distributed.initialize against a shared coordinator →
4 local CPU devices (8 global) → global (2,2,2) mesh → tiny filmed Trainer →
shard_state (multi-host make_array_from_callback path) → even_put of this
host's LOCAL batch shard (reference DistributedSampler semantics: batch is
per-host) → ONE sharded train step → prints the loss.

The parent asserts both processes exit 0 and print the SAME loss — the
global program consumed both hosts' data and reduced gradients across the
process boundary.  This is the CPU-simulated multi-host test SURVEY §4
plans; the reference has no multi-node test at all.

Not a pytest file (no test_ prefix): launched via subprocess only.
"""

import os
import sys


def main() -> int:
    proc_id = int(sys.argv[1])
    n_proc = int(sys.argv[2])
    port = sys.argv[3]

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=n_proc,
        process_id=proc_id,
    )
    assert jax.process_count() == n_proc, jax.process_count()
    assert len(jax.devices()) == 4 * n_proc, len(jax.devices())

    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from msfno_tpu.data.synthetic import gen_batch
    from msfno_tpu.parallel import make_mesh, make_sharded_train_step
    from msfno_tpu.parallel.sharded_train import shard_state
    from msfno_tpu.training.trainer import Trainer
    from msfno_tpu.utils.config import FilmConfig, SFNOConfig, TrainConfig

    cfg = SFNOConfig(
        img_size=(16, 32), scale_factor=2, in_chans=3, out_chans=3,
        embed_dim=8, num_layers=2, spectral_layers=1,
        film=FilmConfig(
            film_gen_type="gcn_custom", model_depth=1, embed_dim=16,
            mlp_dim=16, num_film_features=8, sst_shape=(8, 16),
            temporal_step=2,
        ),
    )
    # per-host batch (reference per-GPU batch semantics); global batch =
    # 2 hosts x 2 = 4 over the data axis of the (2,2,2) mesh
    tcfg = TrainConfig(batch_size=2, film_scale_start=1.0)
    mesh = make_mesh(8)
    trainer = Trainer(cfg, tcfg)
    # same seed on every host -> identical host-side init; shard_state
    # assembles the global arrays from each host's addressable shards
    state = shard_state(trainer.init_state(), mesh)
    step, place = make_sharded_train_step(trainer, mesh)
    # DIFFERENT data per host (seed = proc_id): the matching losses the
    # parent asserts can only come from cross-host collectives
    b = gen_batch(cfg, tcfg.batch_size, tcfg.multi_step_training,
                  seed=proc_id)
    era5, sst = place(b.era5, b.sst)
    state, metrics = step(state, era5, sst)
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    print(f"MPLOSS {loss:.8f}", flush=True)

    # sharded INFERENCE across the two processes: the live (sharded,
    # partly non-addressable) params feed scan_rollout directly; the
    # emitted field is replicated so every host can fetch it
    import jax.numpy as jnp

    from msfno_tpu.inference.rollout import scan_rollout

    # per-host era5 AND sst shards assemble to the same global batch
    outs = scan_rollout(
        trainer.model, state.params, b.era5[0], 1,
        sst_seq=jnp.asarray(b.sst[1:2]), scale=1.0, mesh=mesh,
    )
    arr = np.asarray(outs)
    assert np.isfinite(arr).all()
    print(f"MPROLL {float(arr.mean()):.8f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
