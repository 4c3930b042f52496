"""SPMD training step over a device mesh.

The multi-chip counterpart of Trainer._train_step_impl: parameters and
optimizer state live with their NamedShardings, the batch is sharded over the
"data" axis (+ latitude over "lat"), activations get their constraints via
the annotate hooks, and XLA GSPMD inserts the collectives (gradient psum over
"data" by construction — replacing DDP's bucketed all-reduce,
reference train.py:370-380).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from msfno_tpu.parallel.annotate import use_mesh
from msfno_tpu.parallel.mesh import param_shardings
from msfno_tpu.training.trainer import Trainer, TrainState


def shard_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place a TrainState on the mesh with canonical param shardings."""
    rep = NamedSharding(mesh, P())

    def put_params(tree):
        shardings = param_shardings(mesh, tree)
        return jax.tree_util.tree_map(
            lambda v, s: jax.device_put(v, s), tree, shardings
        )

    return TrainState(
        trainable=put_params(state.trainable),
        frozen=put_params(state.frozen),
        opt_state=jax.tree_util.tree_map(
            lambda v: jax.device_put(v, rep), state.opt_state
        ),
        step=jax.device_put(state.step, rep),
        film_scale=jax.device_put(state.film_scale, rep),
    )


def make_sharded_train_step(trainer: Trainer, mesh: Mesh):
    """Returns (step_fn, place_batch).  step_fn(state, era5, sst) is jitted
    over the mesh; call it (and trace it) inside the returned context."""
    era5_sharding = NamedSharding(mesh, P(None, "data", "lat", None, None))
    sst_sharding = NamedSharding(mesh, P(None, "data", None, None, None))

    def place_batch(era5, sst=None):
        era5 = jax.device_put(np.asarray(era5), era5_sharding)
        if sst is not None:
            sst = jax.device_put(np.asarray(sst), sst_sharding)
        return era5, sst

    def step(state, era5, sst):
        with use_mesh(mesh):
            return trainer._train_step_impl(state, era5, sst)

    return jax.jit(step, donate_argnums=(0,)), place_batch
