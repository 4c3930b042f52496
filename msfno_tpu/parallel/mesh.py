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


def factorize(n: int) -> tuple[int, int, int]:
    """Split n devices into (data, lat, channel) sizes: prime factors are
    dealt round-robin lat -> channel -> data so a balanced mesh exercises
    every parallelism axis (e.g. 8 -> (2, 2, 2), 4 -> (1, 2, 2))."""
    factors = []
    m = n
    d = 2
    while m > 1:
        while m % d == 0:
            factors.append(d)
            m //= d
        d += 1 if d == 2 else 2
    sizes = {"lat": 1, "channel": 1, "data": 1}
    order = ["lat", "channel", "data"]
    for i, f in enumerate(sorted(factors, reverse=True)):
        sizes[order[i % 3]] *= f
    return (sizes["data"], sizes["lat"], sizes["channel"])


def make_mesh(
    n_devices: int | None = None,
    shape: tuple[int, int, int] | None = None,
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    shape = shape or factorize(n)
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
    hosts' devices."""
    x = np.asarray(x)
    if jax.process_count() > 1:
        sharding = NamedSharding(mesh, even_pspec(
            # global shape: the local block scaled by how many ways the
            # sharding splits each dim across processes is inferred by
            # make_array_from_process_local_data when global_shape is
            # omitted; the spec itself must be divisibility-checked
            # against the GLOBAL shape, which equals local shape except
            # on process-spanning axes — even_pspec on the local shape is
            # conservative (a dim divisible locally is divisible globally
            # when every host holds an equal block)
            x.shape, spec, mesh
        ))
        return jax.make_array_from_process_local_data(sharding, x)
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
