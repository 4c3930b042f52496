"""Activation-sharding annotation hooks.

Model code calls annotate_grid / annotate_spectral at layer boundaries; by
default these are identity.  Inside a `use_mesh(mesh)` scope they become
with_sharding_constraint with the canonical specs from parallel/mesh.py, so
the same model code runs single-chip and SPMD without plumbing a mesh through
every module (the GSPMD "annotate and let XLA insert collectives" recipe).
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
from jax.sharding import NamedSharding

from msfno_tpu.parallel.mesh import grid_pspec, modes_pspec, spectral_pspec

_active_mesh = contextvars.ContextVar("msfno_active_mesh", default=None)


@contextlib.contextmanager
def use_mesh(mesh):
    token = _active_mesh.set(mesh)
    try:
        yield
    finally:
        _active_mesh.reset(token)


def active_mesh():
    return _active_mesh.get()


def _constrain(x, spec):
    mesh = _active_mesh.get()
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def annotate_grid(x):
    """(B, H, W, C) activations: shard batch/lat/channel."""
    return _constrain(x, grid_pspec())


def annotate_spectral(x):
    """(B, L, M, C) spectral activations: shard batch/m/channel."""
    return _constrain(x, spectral_pspec())


def annotate_modes(x):
    """(B, K, C) gathered triangular modes: shard batch/modes/channel."""
    return _constrain(x, modes_pspec())
