"""Device mesh and sharding rules.

Replaces the reference's single-node DDP/NCCL stack (main.py:39-49,
train.py:370-380) with SPMD over a jax.sharding.Mesh.  Axes:

  data    — batch (pure DP; reference parity)
  lat     — latitude bands in grid space / longitudinal orders m in spectral
            space.  The FFT->Legendre "transpose" between those two shardings
            is the all_to_all the reference has no analogue for
            (SURVEY.md section 2.3 / 5.7).
  channel — embedding channels (lane axis)

Under jit, activations are annotated with with_sharding_constraint at layer
boundaries (see msfno_tpu/parallel/annotate.py) and XLA GSPMD inserts the
collectives; gradients are reduced by construction (no DDP hooks, no
barriers).
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "lat", "channel")


def factorize(n: int, data_target: int = 1) -> tuple[int, int, int]:
    """Split n devices into (data, lat, channel) sizes.

    data_target > 1 (training with a real batch): prime factors are dealt
    to the DATA axis first, up to data_target — the data axis carries no
    per-step all_to_all, so data-major meshes are the scaling-efficient
    choice for training (measured comm model: BASELINE.md "Round-5 comm
    volume" — lat-sharding a batch-1 step moves 313-615 MB/shard/step).

    data_target == 1 (default; batch-1 inference): factors are dealt
    round-robin lat -> channel -> data — lat-sharding divides the 0.5-1 GB
    full-res activations and the pos_embed for memory relief
    (e.g. 8 -> (2, 2, 2), 4 -> (1, 2, 2))."""
    factors = []
    m = n
    d = 2
    while m > 1:
        while m % d == 0:
            factors.append(d)
            m //= d
        d += 1 if d == 2 else 2
    sizes = {"lat": 1, "channel": 1, "data": 1}
    rest = []
    for f in sorted(factors, reverse=True):
        if sizes["data"] * f <= data_target:
            sizes["data"] *= f
        else:
            rest.append(f)
    order = ["lat", "channel", "data"]
    for i, f in enumerate(rest):
        sizes[order[i % 3]] *= f
    return (sizes["data"], sizes["lat"], sizes["channel"])


def make_mesh(
    n_devices: int | None = None,
    shape: tuple[int, int, int] | None = None,
    devices=None,
    data_target: int = 1,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    shape = shape or factorize(n, data_target=data_target)
    if math.prod(shape) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, AXES)


# ------------------------------------------------------ partition specs

def grid_pspec(batched: bool = True) -> P:
    """(B, H, W, C_embed): batch over data, latitude over lat, channels over
    channel."""
    return P("data", "lat", None, "channel") if batched else P("lat", None, "channel")


def spectral_pspec() -> P:
    """(B, L, M, C): orders m over lat (post-transpose layout), channels over
    channel."""
    return P("data", None, "lat", "channel")


def modes_pspec() -> P:
    """Gathered triangular mode set (B, K, C): modes over lat, channels over
    channel (SpectralConvS2's per-mode contraction layout)."""
    return P("data", "lat", "channel")


def batch_pspec() -> P:
    """Raw input batch (B, H, W, C_in): C_in (73) stays unsharded."""
    return P("data", "lat", None, None)


def io_shardings(mesh: Mesh):
    return {
        "era5": NamedSharding(mesh, P(None, "data", "lat", None, None)),  # (S,B,H,W,C)
        "sst": NamedSharding(mesh, P(None, "data", None, None, None)),
        "replicated": NamedSharding(mesh, P()),
    }


def even_pspec(shape: tuple[int, ...], spec: P, mesh: Mesh) -> P:
    """Drop spec axes whose mesh size does not divide the array dimension.

    `jax.device_put` (host placement) requires even splits — unlike
    with_sharding_constraint inside jit, where GSPMD pads.  The full-res
    721-latitude grid over lat=2 is the motivating case: the input lands
    replicated (or batch-sharded only) and the first annotate/shard_map
    inside the jitted step re-shards it with padding.  Axes also drop when
    the dim is smaller than the axis (batch 1 over data=2 would leave a
    zero-sized shard)."""
    names = list(spec) + [None] * (len(shape) - len(spec))
    out = []
    for dim, name in zip(shape, names):
        if name is None:
            out.append(None)
            continue
        axes = name if isinstance(name, tuple) else (name,)
        size = math.prod(mesh.shape[a] for a in axes)
        out.append(name if dim % size == 0 else None)
    return P(*out)


def _addressable_positions(mesh: Mesh, axis: str) -> int:
    """How many of the `axis` positions in the mesh grid contain at least one
    device addressable by THIS process.  make_array_from_process_local_data
    treats the local block as covering exactly those positions, so the
    global dim of a sharded array is local_dim * axis_size / this."""
    ax = mesh.axis_names.index(axis)
    dev = np.moveaxis(mesh.devices, ax, 0)
    me = jax.process_index()
    return sum(
        1
        for i in range(dev.shape[0])
        if any(d.process_index == me for d in dev[i].flat)
    )


def even_put(x, mesh: Mesh, spec: P):
    """Place a host batch on the mesh with the divisibility-safe subset of
    `spec` (see even_pspec).

    Single-process: a plain device_put of the global array.  Multi-process
    (a real pod, every host running this same code): `x` is this process's
    LOCAL portion of the global batch (the PrefetchLoader feeds each host
    a disjoint shard — reference DistributedSampler semantics, so
    batch_size is per-host exactly like the reference's per-GPU batch) and
    the global jax.Array is assembled via
    make_array_from_process_local_data — device_put cannot address other
    hosts' devices.

    Divisibility is checked against the TRUE GLOBAL shape (local dim scaled
    by the process span of each sharded mesh axis).  A process-spanning
    axis is never silently demoted to replicated: each host holds a
    DISTINCT loader shard, so a "replicated" assembly would produce a
    global array whose buffers disagree across hosts — that case raises
    instead.  Demotion stays allowed only for axes fully addressable by
    every process (same semantics as the single-process branch)."""
    x = np.asarray(x)
    if jax.process_count() > 1:
        names = list(spec) + [None] * (x.ndim - len(spec))
        out_spec, global_shape = [], []
        for dim, name in zip(x.shape, names):
            if name is None:
                out_spec.append(None)
                global_shape.append(dim)
                continue
            axes = name if isinstance(name, tuple) else (name,)
            size = math.prod(mesh.shape[a] for a in axes)
            span = math.prod(
                mesh.shape[a] // _addressable_positions(mesh, a) for a in axes
            )
            gdim = dim * span
            if gdim % size != 0:
                if span > 1:
                    raise ValueError(
                        f"even_put: global dim {gdim} (local {dim} x process "
                        f"span {span}) is not divisible by mesh axes {axes} "
                        f"(size {size}); each host feeds a distinct loader "
                        f"shard, so replicated placement would be silently "
                        f"inconsistent across hosts — pad the per-host batch "
                        f"or choose a mesh whose {axes} size divides it"
                    )
                name = None  # not process-spanning: safe local demotion
            out_spec.append(name)
            global_shape.append(gdim)
        sharding = NamedSharding(mesh, P(*out_spec))
        return jax.make_array_from_process_local_data(
            sharding, x, tuple(global_shape)
        )
    return jax.device_put(
        x, NamedSharding(mesh, even_pspec(x.shape, spec, mesh))
    )


def param_pspec(path: tuple[str, ...], value) -> P:
    """Parameter sharding rules.  Most params are small and replicated; the
    pos_embed (H, W, C — ~1 GB at full size, sfnonet.py:528-530) is sharded
    over (lat, channel), and per-mode spectral conv weights over channel."""
    name = "/".join(str(p) for p in path)
    if name.endswith("pos_embed"):
        return P("lat", None, "channel")
    if value.ndim >= 3 and name.endswith("/w") and "filter" in name:
        # SpectralConvS2 (K, C_in, C_out, 2)
        return P(None, None, "channel", None)
    return P()


def param_shardings(mesh: Mesh, params) -> dict:
    """NamedSharding pytree for a param tree."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    out = {
        k: NamedSharding(mesh, param_pspec(k, v)) for k, v in flat.items()
    }
    return traverse_util.unflatten_dict(out)
