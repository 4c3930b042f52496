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

from msfno_tpu.ops.sht import (
    InverseRealSHT,
    RealSHT,
    _dft_analysis_matrices,
    _dft_synthesis_matrices,
    _matmul_precision,
)


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
        # merged truncated-DFT analysis matrix (W, 2*M_pad) = [C | -S], each
        # half zero-padded to M_pad: the local longitude stage is ONE MXU
        # matmul (XLA's rfft lowers to the VPU, ~20x slower at full res —
        # same redesign as ops/sht.py, here per latitude band)
        cmat, smat = _dft_analysis_matrices(sht.nlon, sht.mmax)
        self.dft = np.concatenate(
            [_pad_axis(cmat, self.m_pad, 1), _pad_axis(-smat, self.m_pad, 1)],
            axis=1,
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        dft = jnp.asarray(self.dft)
        m_pad = self.m_pad
        axis = self.axis
        prec = _matmul_precision(self.sht.mxu_dtype)
        if x.shape[-3] != self.h_pad:
            widths = [(0, 0)] * x.ndim
            widths[-3] = (0, self.h_pad - x.shape[-3])
            x = jnp.pad(x, widths)

        def local(xb, w):
            # xb: (B, H_pad/P, W, C); one matmul -> stacked [re | im] modes.
            # w: this device's (M_pad/P, L, H_pad) Legendre chunk — the
            # weights ride the shard_map in_specs (sharded over m) instead
            # of a closed-over full tensor + dynamic_slice, which would
            # REPLICATE ~1.5 GB of fp32 Legendre weights per chip at full
            # resolution (the very memory this module exists to scale).
            # The merged DFT matrix stays a closure constant: (W, 2M) fp32
            # is ~8.5 MB and every h-shard needs all of it.
            f = jnp.einsum(
                "bhwc,wm->bhmc", xb.astype(jnp.float32), dft,
                precision=prec, preferred_element_type=jnp.float32,
            )
            fhat = jax.lax.complex(f[..., :m_pad, :], f[..., m_pad:, :])
            # transpose shards: m gets split, h gets gathered
            fhat = jax.lax.all_to_all(
                fhat, axis, split_axis=2, concat_axis=1, tiled=True
            )  # (B, H_pad, M_pad/P, C)
            re = jnp.einsum("mlh,bhmc->blmc", w, jnp.real(fhat),
                            precision=prec)
            im = jnp.einsum("mlh,bhmc->blmc", w, jnp.imag(fhat),
                            precision=prec)
            return jax.lax.complex(re, im)

        return shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(None, self.axis, None, None), P(self.axis, None, None)),
            out_specs=P(None, None, self.axis, None),
            check_vma=False,
        )(x, jnp.asarray(self.weights))


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
        # merged synthesis matrix (2*M_pad, W) = [Ci; -Si] (halves padded to
        # M_pad with zero rows): the local longitude stage is one matmul and
        # the mode truncation is implicit — no irfft, no nfreq zero-pad
        ci, si = _dft_synthesis_matrices(isht.nlon, isht.mmax)
        self.dft = np.concatenate(
            [_pad_axis(ci, self.m_pad, 0), _pad_axis(-si, self.m_pad, 0)],
            axis=0,
        )

    def __call__(self, coeffs: jax.Array) -> jax.Array:
        dft = jnp.asarray(self.dft)
        axis = self.axis
        nlat = self.isht.nlat
        prec = _matmul_precision(self.isht.mxu_dtype)

        def local(cb, w):
            # cb: (B, L, M_pad/P, C); w: this device's (M_pad/P, L, H_pad)
            # synthesis-pct chunk (m-sharded via in_specs — see the forward
            # transform's rationale)
            re = jnp.einsum("mlh,blmc->bhmc", w, jnp.real(cb),
                            precision=prec)
            im = jnp.einsum("mlh,blmc->bhmc", w, jnp.imag(cb),
                            precision=prec)
            xm = jax.lax.complex(re, im)  # (B, H_pad, M_pad/P, C)
            # transpose shards back: h gets split, m gets gathered
            xm = jax.lax.all_to_all(
                xm, axis, split_axis=1, concat_axis=2, tiled=True
            )  # (B, H_pad/P, M_pad, C)
            cat = jnp.concatenate([jnp.real(xm), jnp.imag(xm)], axis=-2)
            return jnp.einsum(
                "bhmc,mw->bhwc", cat, dft,
                precision=prec, preferred_element_type=jnp.float32,
            )

        out = shard_map(
            local,
            mesh=self.mesh,
            in_specs=(
                P(None, None, self.axis, None),
                P(self.axis, None, None),
            ),
            out_specs=P(None, self.axis, None, None),
            check_vma=False,
        )(coeffs, jnp.asarray(self.pct))
        if self.h_pad != nlat:
            out = out[..., :nlat, :, :]
        return out


def make_sharded_transforms(sht: RealSHT, isht: InverseRealSHT, mesh: Mesh,
                            axis: str = "lat"):
    return ShardedRealSHT(sht, mesh, axis), ShardedInverseRealSHT(isht, mesh, axis)
