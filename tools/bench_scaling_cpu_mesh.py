"""Scaling-harness demo on a virtual 8-device CPU mesh.

Exercises measure_scaling end-to-end (mesh construction, sharded train step,
state-donation chaining, weak-scaling bookkeeping) at n = 1, 2, 4, 8.

IMPORTANT: the efficiency column is NOT a scaling measurement here — the
virtual devices all share one CPU socket, so weak scaling multiplies total
work on fixed silicon and "efficiency" mostly measures core oversubscription
(observed 2026-08-18: 5.9 ms -> 27.3 ms per step at n=1 -> 8, "efficiency"
21.7%).  On real multi-chip hardware each mesh device brings its own
MXU/HBM and the same harness yields the true number (BASELINE.md target
>= 80% to N hosts).  This script exists to prove the harness itself and the
collective paths work, and as the template for the real-hardware run.
"""

from __future__ import annotations


def main(device_counts=(1, 2, 4, 8), iters: int = 5):
    import jax

    if jax.config.jax_platforms != "cpu":  # allow real-backend reuse
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", max(device_counts))
        except RuntimeError:
            pass  # backend already initialized (e.g. a real pod): use as-is

    import __graft_entry__ as ge
    from msfno_tpu.data.synthetic import gen_batch
    from msfno_tpu.parallel import make_sharded_train_step
    from msfno_tpu.parallel.distributed import measure_scaling
    from msfno_tpu.parallel.sharded_train import shard_state
    from msfno_tpu.training.trainer import Trainer
    from msfno_tpu.utils.config import TrainConfig

    cfg = ge._flagship_cfg(tiny=True)

    def step_fn(mesh):
        n = mesh.devices.size
        batch = max(2, n)  # weak scaling: global batch grows with n
        tcfg = TrainConfig(batch_size=batch, film_scale_start=1.0)
        tr = Trainer(cfg, tcfg)
        state = shard_state(tr.init_state(), mesh)
        step, place = make_sharded_train_step(tr, mesh)
        b = gen_batch(cfg, batch, tcfg.multi_step_training, seed=0)
        era5, sst = place(b.era5, b.sst)
        cell = {"s": state}

        def fn(e, ss):
            s2, m = step(cell["s"], e, ss)
            cell["s"] = s2  # state buffers are donated: chain, never reuse
            return m["loss"]

        return fn, (era5, sst)

    res = measure_scaling(step_fn, list(device_counts), iters=iters,
                          mode="weak")
    for n, r in res.items():
        print(f"n={n}: {r['seconds'] * 1e3:.1f} ms/step, "
              f"efficiency {100 * r['efficiency']:.1f}%")
    return res


if __name__ == "__main__":
    main()
