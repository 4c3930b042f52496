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
from msfno_tpu.parallel.mesh import io_shardings, param_shardings
from msfno_tpu.training.trainer import Trainer, TrainState


def _put(v, sharding):
    """device_put that also works multi-host: device_put cannot address
    other processes' devices, so under process_count > 1 the global array
    is assembled from this host's full copy via make_array_from_callback
    (every host holds the same host value — same-seed init / checkpoint
    load — and contributes its addressable shards)."""
    if jax.process_count() > 1:
        arr = np.asarray(v)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )
    return jax.device_put(v, sharding)


def shard_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place a TrainState on the mesh with canonical param shardings.

    Optimizer-state subtrees that mirror the trainable tree (adam mu/nu,
    momentum traces, MultiSteps acc_grads) inherit the PARAM shardings:
    replicating them would cost ~2x the very memory the pos_embed sharding
    exists to save (adam state for a sharded 1 GB param is 2 GB replicated).
    Scalar leaves (counts, step) are replicated."""
    from flax import traverse_util

    rep = NamedSharding(mesh, P())
    tr_shardings = param_shardings(mesh, state.trainable)
    tr_keys = set(traverse_util.flatten_dict(state.trainable).keys())

    def put_params(tree):
        shardings = param_shardings(mesh, tree)
        return jax.tree_util.tree_map(
            lambda v, s: _put(v, s), tree, shardings
        )

    def put_opt(node):
        if isinstance(node, dict):
            if set(traverse_util.flatten_dict(node).keys()) == tr_keys:
                return jax.tree_util.tree_map(
                    lambda v, s: _put(v, s), node, tr_shardings
                )
            return {k: put_opt(v) for k, v in node.items()}
        if hasattr(node, "_fields"):  # optax NamedTuple states
            return type(node)(*(put_opt(getattr(node, f)) for f in node._fields))
        if isinstance(node, tuple):
            return tuple(put_opt(x) for x in node)
        if isinstance(node, list):
            return [put_opt(x) for x in node]
        if node is None:
            return None
        return _put(node, rep)

    return TrainState(
        trainable=put_params(state.trainable),
        frozen=put_params(state.frozen),
        opt_state=put_opt(state.opt_state),
        step=_put(state.step, rep),
        film_scale=_put(state.film_scale, rep),
    )


def make_sharded_train_step(trainer: Trainer, mesh: Mesh):
    """Returns (step_fn, place_batch).  step_fn(state, era5, sst) is jitted
    over the mesh; call it (and trace it) inside the returned context."""
    io = io_shardings(mesh)  # single source of the canonical batch specs
    era5_spec = io["era5"].spec
    sst_spec = io["sst"].spec

    def place_batch(era5, sst=None):
        from msfno_tpu.parallel.mesh import even_put

        # even_put drops spec axes the shape can't split evenly (721 lat
        # rows over lat=2, batch 1 over data=2); the jitted step's first
        # sharding constraint re-shards with GSPMD padding
        era5 = even_put(era5, mesh, era5_spec)
        if sst is not None:
            sst = even_put(sst, mesh, sst_spec)
        return era5, sst

    def step(state, era5, sst):
        with use_mesh(mesh):
            return trainer._train_step_impl(state, era5, sst)

    return jax.jit(step, donate_argnums=(0,)), place_batch
