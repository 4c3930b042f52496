"""Latitude-sharded SHT with an explicit all_to_all transpose (shard_map).

The reference never shards the sphere — the full 721x1440x256 activation
lives on one GPU (SURVEY.md section 5.7, main.py:815).  This module is the
new TPU-native capability required by BASELINE.json: grid fields sharded over
latitude bands, spectral fields sharded over longitudinal orders m, with the
switch between the two layouts done as ONE all_to_all over ICI between the
longitude-FFT stage and the Legendre-matmul stage:

  grid   (B, H/P, W, C)   --rfft over W (local)-->
         (B, H/P, M, C)   --all_to_all (m <-> h shards)-->
         (B, H, M/P, C)   --Legendre matmul over full H (local)-->
  spec   (B, L, M/P, C)

The inverse transform mirrors it.  Both sharded axes pad to a multiple of the
mesh axis size with exactness preserved:
- m is zero-padded; the extra orders carry zero analysis/synthesis weights;
- H (latitude) is zero-padded when nlat % P != 0 — the 721-row equiangular
  full-resolution grid being the motivating case.  Padded rows carry zero
  quadrature weights in analysis, and the inverse drops them after the
  shard_map (a global slice GSPMD lowers to local slicing + rebalance).
Differentiable end-to-end (shard_map + all_to_all have transposes), so the
same code path serves training.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from msfno_tpu.ops.sht import InverseRealSHT, RealSHT


# diagnostic: how many sharded transforms have been constructed (lets the
# multi-chip dryrun assert the explicit all_to_all path actually engaged
# instead of silently falling back to GSPMD)
_constructions = 0


def construction_count() -> int:
    return _constructions


def _pad_axis(arr: np.ndarray, size: int, axis: int) -> np.ndarray:
    """Zero-pad `axis` of a weight tensor up to `size`."""
    if arr.shape[axis] == size:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, size - arr.shape[axis])
    return np.pad(arr, widths)


def _round_up(n: int, p: int) -> int:
    return -(-n // p) * p


class ShardedRealSHT:
    """Forward SHT over a mesh axis.  Call inside or outside jit; input
    (B, H, W, C) sharded over `axis` on H, output (B, L, M_pad, C) sharded
    over `axis` on M.  Any nlat is supported (padded internally)."""

    def __init__(self, sht: RealSHT, mesh: Mesh, axis: str = "lat"):
        global _constructions
        _constructions += 1
        self.sht = sht
        self.mesh = mesh
        self.axis = axis
        self.p = mesh.shape[axis]
        self.h_pad = _round_up(sht.nlat, self.p)
        self.m_pad = _round_up(sht.mmax, self.p)
        # (M_pad, L, H_pad) fp32; zero rows/cols for padded orders/latitudes
        self.weights = _pad_axis(
            _pad_axis(sht.weights, self.m_pad, 0), self.h_pad, 2
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        w_full = jnp.asarray(self.weights)
        p = self.p
        m_local = self.m_pad // p
        axis = self.axis
        if x.shape[-3] != self.h_pad:
            widths = [(0, 0)] * x.ndim
            widths[-3] = (0, self.h_pad - x.shape[-3])
            x = jnp.pad(x, widths)

        def local(xb):
            # xb: (B, H_pad/P, W, C)
            fhat = jnp.fft.rfft(xb.astype(jnp.float32), axis=-2, norm="forward")
            fhat = fhat[..., : self.sht.mmax, :]
            pad = [(0, 0)] * fhat.ndim
            pad[-2] = (0, self.m_pad - self.sht.mmax)
            fhat = jnp.pad(fhat, pad)
            # transpose shards: m gets split, h gets gathered
            fhat = jax.lax.all_to_all(
                fhat, axis, split_axis=2, concat_axis=1, tiled=True
            )  # (B, H_pad, M_pad/P, C)
            # my m-chunk of the weights
            mi = jax.lax.axis_index(axis)
            w = jax.lax.dynamic_slice_in_dim(w_full, mi * m_local, m_local, 0)
            re = jnp.einsum("mlh,bhmc->blmc", w, jnp.real(fhat))
            im = jnp.einsum("mlh,bhmc->blmc", w, jnp.imag(fhat))
            return jax.lax.complex(re, im)

        return shard_map(
            local,
            mesh=self.mesh,
            in_specs=P(None, self.axis, None, None),
            out_specs=P(None, None, self.axis, None),
            check_vma=False,
        )(x)


class ShardedInverseRealSHT:
    """Inverse SHT over a mesh axis: (B, L, M_pad, C) m-sharded ->
    (B, H, W, C) latitude-sharded.  Any nlat is supported (computed on the
    padded grid, sliced back after the shard_map)."""

    def __init__(self, isht: InverseRealSHT, mesh: Mesh, axis: str = "lat"):
        self.isht = isht
        self.mesh = mesh
        self.axis = axis
        self.p = mesh.shape[axis]
        self.h_pad = _round_up(isht.nlat, self.p)
        self.m_pad = _round_up(isht.mmax, self.p)
        self.pct = _pad_axis(_pad_axis(isht.pct, self.m_pad, 0), self.h_pad, 2)

    def __call__(self, coeffs: jax.Array) -> jax.Array:
        p_full = jnp.asarray(self.pct)
        p = self.p
        m_local = self.m_pad // p
        axis = self.axis
        nlat, nlon = self.isht.nlat, self.isht.nlon
        nfreq = nlon // 2 + 1

        def local(cb):
            # cb: (B, L, M_pad/P, C) for my m-chunk
            mi = jax.lax.axis_index(axis)
            w = jax.lax.dynamic_slice_in_dim(p_full, mi * m_local, m_local, 0)
            re = jnp.einsum("mlh,blmc->bhmc", w, jnp.real(cb))
            im = jnp.einsum("mlh,blmc->bhmc", w, jnp.imag(cb))
            xm = jax.lax.complex(re, im)  # (B, H_pad, M_pad/P, C)
            # transpose shards back: h gets split, m gets gathered
            xm = jax.lax.all_to_all(
                xm, axis, split_axis=1, concat_axis=2, tiled=True
            )  # (B, H_pad/P, M_pad, C)
            xm = xm[..., : self.isht.mmax, :]
            pad = [(0, 0)] * xm.ndim
            pad[-2] = (0, nfreq - self.isht.mmax)
            xm = jnp.pad(xm, pad)
            return jnp.fft.irfft(xm, n=nlon, axis=-2, norm="forward")

        out = shard_map(
            local,
            mesh=self.mesh,
            in_specs=P(None, None, self.axis, None),
            out_specs=P(None, self.axis, None, None),
            check_vma=False,
        )(coeffs)
        if self.h_pad != nlat:
            out = out[..., :nlat, :, :]
        return out


def make_sharded_transforms(sht: RealSHT, isht: InverseRealSHT, mesh: Mesh,
                            axis: str = "lat"):
    return ShardedRealSHT(sht, mesh, axis), ShardedInverseRealSHT(isht, mesh, axis)
