"""Planar FFT transforms wrapped with the SHT interface.

TPU-native equivalent of the reference's RealFFT2 / InverseRealFFT2
(MSFNO/Models/sfno/layers.py:181-250), selected by
spectral_transform="fft" (sfnonet.py:557-569).  Two-sided latitude modes:
the first ceil(lmax/2) and last floor(lmax/2) frequency rows are kept.
Layout is channels-last (..., H, W, C); FFT axes are (-3, -2).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RealFFT2:
    nlat: int
    nlon: int
    lmax: int | None = None
    mmax: int | None = None

    def __post_init__(self):
        object.__setattr__(self, "lmax", self.lmax or self.nlat)
        object.__setattr__(self, "mmax", self.mmax or self.nlon // 2 + 1)
        if self.lmax % 2 != 0:
            raise ValueError("lmax must be even (two-sided latitude modes)")

    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(jnp.float32)
        y = jnp.fft.rfft2(x, axes=(-3, -2), norm="ortho")
        hi = y[..., : math.ceil(self.lmax / 2), : self.mmax, :]
        lo = y[..., -math.floor(self.lmax / 2) :, : self.mmax, :]
        return jnp.concatenate((hi, lo), axis=-3)


@dataclasses.dataclass(frozen=True)
class InverseRealFFT2:
    nlat: int
    nlon: int
    lmax: int | None = None
    mmax: int | None = None

    def __post_init__(self):
        object.__setattr__(self, "lmax", self.lmax or self.nlat)
        object.__setattr__(self, "mmax", self.mmax or self.nlon // 2 + 1)

    def __call__(self, y: jax.Array) -> jax.Array:
        """Replicates the reference's inverse exactly (layers.py:236-249):
        ``torch.fft.irfft2(x, s=(nlat, nlon))`` zero-pads the truncated input
        at the *end* of each frequency axis — the rows the forward transform
        gathered from the tail (negative latitude frequencies) are therefore
        re-interpreted at positive positions ceil(lmax/2)..lmax-1.  This makes
        fwd/inv NOT mutual inverses; it is the reference's semantics and the
        pretrained-weight contract, so it is reproduced bit-for-bit rather
        than 'fixed'."""
        y = y.astype(jnp.complex64)
        nfreq = self.nlon // 2 + 1
        pad = [(0, 0)] * y.ndim
        pad[-3] = (0, self.nlat - y.shape[-3])
        pad[-2] = (0, nfreq - y.shape[-2])
        full = jnp.pad(y, pad)
        return jnp.fft.irfft2(full, s=(self.nlat, self.nlon), axes=(-3, -2), norm="ortho")
