"""Autoregressive inference rollout (reference FourCastNetv2.running(),
MSFNO/Models/sfno/model.py:289-372).

TPU-first differences from the reference:
- the model state stays HBM-resident across steps; the reference pulls the
  full 73x721x1440 field to the CPU every 6h step (model.py:347).  Here a
  jitted step function feeds its output back as the next input and only the
  requested channel subset is fetched, asynchronously, while the next step
  computes.
- scan_rollout offers a lax.scan variant so long horizons compile to a single
  XLA while-loop program.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from msfno_tpu.data.normalization import Normalizer, SSTNormalizer

Array = jax.Array


@dataclasses.dataclass
class RolloutConfig:
    steps: int  # number of 6h steps (lead_time // 6, model.py:327)
    step_hours: int = 6
    collect_channels: Sequence[int] | None = None  # None = all
    denormalize: bool = True


def serving_params(params, dtype=jnp.bfloat16):
    """Cast fp32 param leaves to `dtype` for bf16-compute serving.

    In the fast inference config every consumer already casts its operands to
    bfloat16 at the MXU (compute_dtype / *_mxu_dtype knobs), so storing the
    parameters in bfloat16 is numerically near-identical while halving the
    per-step HBM parameter traffic — the (721, 1440, 256) pos_embed alone is
    1.06 GB in fp32, read every step.  Use only with the bf16 fast config;
    the fp32 parity path must keep fp32 parameters.
    """
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if isinstance(a, (jax.Array, np.ndarray)) and a.dtype == jnp.float32
        else a,
        params,
    )


def place_rollout_inputs(mesh, params, x0=None, sst_seq=None):
    """Mesh placement for inference: params get their canonical shardings
    (pos_embed over lat×channel — the 1 GB buffer sharding exists for),
    the state is batch/lat-sharded where shapes divide, SST replicated.
    Single source for rollout / scan_rollout / eval (sharded inference has
    no reference analogue; the rollout it replaces is single-GPU,
    model.py:289-372).

    Multi-host: host-resident leaves (checkpoint loads) assemble globally
    via sharded_train._put (make_array_from_callback); leaves that are
    already global non-addressable jax.Arrays (a live sharded TrainState)
    pass through untouched — the jitted program reshards per its
    constraints."""
    from msfno_tpu.parallel.mesh import batch_pspec, even_put, param_shardings
    from msfno_tpu.parallel.sharded_train import _put

    def place_leaf(v, s):
        if (
            isinstance(v, jax.Array)
            and not v.is_fully_addressable
        ):
            return v  # already a global array on the mesh
        return _put(v, s)

    params = jax.tree_util.tree_map(
        place_leaf, params, param_shardings(mesh, params)
    )
    if x0 is not None:
        x0 = even_put(x0, mesh, batch_pspec())
    if sst_seq is not None:
        from jax.sharding import PartitionSpec as P

        # batch-sharded like x0 (multi-host: per-host SST shards assemble
        # to the same global batch as the per-host era5 shards; a
        # replicated placement would leave the film batch at the LOCAL
        # size while x0 assembles globally)
        sst_seq = even_put(
            np.asarray(sst_seq), mesh, P(None, "data", None, None, None)
        )
    return params, x0, sst_seq


def make_step_fn(model, params, filmed: bool, scale: float = 1.0,
                 mesh=None) -> Callable:
    """One normalized-space 6h step: state -> next state.

    params are bound as an explicit jit argument, not a closure: closing over
    on-device arrays bakes them into the lowered program as MLIR constants,
    which forces a device->host fetch at trace time (pathological or
    unsupported over remote-TPU transports)."""
    if filmed:
        def step(p, x, sst):
            return model.apply({"params": p}, x, sst, scale)
    else:
        def step(p, x, sst):
            return model.apply({"params": p}, x)
    if mesh is not None:
        # activate the annotate hooks during tracing so the grid/spectral
        # sharding constraints (and the explicit all_to_all SHT) engage
        from msfno_tpu.parallel.annotate import use_mesh

        inner = step

        def step(p, x, sst):
            with use_mesh(mesh):
                return inner(p, x, sst)

    jitted = jax.jit(step)
    return lambda x, sst: jitted(params, x, sst)


def rollout(
    model,
    params,
    x0: Array,
    cfg: RolloutConfig,
    sst_seq: np.ndarray | None = None,
    normalizer: Normalizer | None = None,
    sst_normalizer: SSTNormalizer | None = None,
    scale: float = 1.0,
    stepper=None,
    mesh=None,
) -> Iterator[np.ndarray]:
    """Streaming rollout; yields one (B, H, W, C_collect) numpy field per
    step (denormalized unless cfg.denormalize=False).

    x0 is the *raw* initial condition; normalization happens on device.
    With a mesh, the rollout runs SPMD: params/state sharded, the lat-sharded
    SHT engaged — the memory-bound full-resolution workload SURVEY §5.7
    targets."""
    normalizer = normalizer or Normalizer.identity(x0.shape[-1])
    sstn = sst_normalizer or SSTNormalizer.identity()
    filmed = sst_seq is not None
    if mesh is not None:
        params, x0, sst_seq = place_rollout_inputs(mesh, params, x0, sst_seq)
    step_fn = make_step_fn(model, params, filmed, scale, mesh=mesh)

    collect = (
        np.asarray(cfg.collect_channels)
        if cfg.collect_channels is not None
        else None
    )

    @jax.jit
    def fetch(x):
        out = normalizer(x, reverse=True) if cfg.denormalize else x
        if collect is not None:
            out = out[..., jnp.asarray(collect)]
        # emitted fields are always fp32 numpy regardless of the model's
        # output_dtype (writers/eval consume them); the bf16 carry keeps
        # its perf benefit — only the fetched copy upcasts
        out = out.astype(jnp.float32)
        if mesh is not None:
            # replicate before the host fetch: np.asarray on an output
            # sharded across OTHER hosts' devices fails on a pod; the
            # all_gather this lowers to is the write path's cost anyway
            from jax.sharding import NamedSharding, PartitionSpec as P

            out = jax.lax.with_sharding_constraint(
                out, NamedSharding(mesh, P())
            )
        return out

    # wrap in lambdas: the (ndarray-holding) normalizer dataclasses are not
    # hashable, which jit requires of its callee
    norm_fn = jax.jit(lambda v: normalizer(v))
    sst_fn = jax.jit(lambda v: sstn(v))
    state = norm_fn(jnp.asarray(x0))
    pending = None  # overlap device->host with the next step's compute
    for i in range(cfg.steps):
        sst_i = sst_fn(jnp.asarray(sst_seq[i])) if filmed else None
        state = step_fn(state, sst_i) if filmed else step_fn(state, None)
        out_dev = fetch(state)
        if pending is not None:
            yield np.asarray(pending)
        pending = out_dev
        if stepper is not None:
            stepper(i, cfg.step_hours)
    if pending is not None:
        yield np.asarray(pending)


# compiled scan-rollout programs, keyed by everything that shapes the trace.
# Re-closing over params per call would (a) re-trace the steps-deep scan for
# every (checkpoint, batch) pair in eval_checkpoints and (b) bake the weights
# into the program as constants — the anti-pattern make_step_fn documents for
# remote-TPU transports.  Params are an explicit jit argument instead.
_SCAN_PROGRAMS: dict = {}


def scan_rollout(
    model,
    params,
    x0: Array,
    steps: int,
    sst_seq: Array | None = None,
    normalizer: Normalizer | None = None,
    sst_normalizer: SSTNormalizer | None = None,
    scale: float = 1.0,
    collect_channels: Sequence[int] | None = None,
    mesh=None,
):
    """Whole-rollout-in-one-program variant via lax.scan.  Returns
    (steps, B, H, W, C_collect) normalized-space outputs on device.
    The compiled program is cached: repeat calls with the same model /
    steps / normalization only swap in new params and inputs.
    With a mesh, the whole scan runs SPMD (params sharded, lat-sharded SHT
    active, carry constrained to the grid sharding)."""
    normalizer = normalizer or Normalizer.identity(x0.shape[-1])
    sstn = sst_normalizer or SSTNormalizer.identity()
    filmed = sst_seq is not None
    if mesh is not None:
        params, x0, sst_seq = place_rollout_inputs(mesh, params, x0, sst_seq)
    collect_t = (
        tuple(int(c) for c in collect_channels)
        if collect_channels is not None
        else None
    )
    key = (
        model,
        int(steps),
        filmed,
        collect_t,
        float(scale),
        np.asarray(normalizer.means).tobytes(),
        np.asarray(normalizer.stds).tobytes(),
        repr(sstn),
        mesh,
    )
    run = _SCAN_PROGRAMS.get(key)
    if run is None:
        collect = (
            jnp.asarray(np.asarray(collect_t)) if collect_t is not None else None
        )

        def _body_scan(params, x0, xs):
            def body(state, sst_i):
                if filmed:
                    nxt = model.apply(
                        {"params": params}, state, sstn(sst_i), scale
                    )
                else:
                    nxt = model.apply({"params": params}, state)
                out = nxt if collect is None else nxt[..., collect]
                # emitted slices are fp32 (API invariant — see rollout's
                # fetch); the scan CARRY stays in the model's output dtype
                out = out.astype(jnp.float32)
                if mesh is not None:
                    # replicate the collected output so the caller's
                    # np.asarray works on every host of a pod (the carry
                    # stays sharded — only the emitted field gathers)
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    out = jax.lax.with_sharding_constraint(
                        out, NamedSharding(mesh, P())
                    )
                return nxt, out

            # carry in the model's output dtype (lax.scan requires carry
            # type invariance; a bf16-output serving config halves the
            # full-res carry copy per step)
            out_dt = jnp.dtype(
                getattr(getattr(model, "cfg", None), "output_dtype",
                        "float32")
            )
            _, outs = jax.lax.scan(
                body, normalizer(x0).astype(out_dt), xs, length=steps
            )
            return outs

        if mesh is None:
            _run = _body_scan
        else:
            from msfno_tpu.parallel.annotate import use_mesh

            def _run(params, x0, xs):
                with use_mesh(mesh):
                    return _body_scan(params, x0, xs)

        run = _SCAN_PROGRAMS[key] = jax.jit(_run)
    xs = sst_seq if filmed else jnp.zeros((steps, 0))
    return run(params, jnp.asarray(x0), xs)
