"""Independent, scipy-based stand-in for torch_harmonics' RealSHT /
InverseRealSHT (the reference's SHT engine, MSFNO/Models/sfno/sfnonet.py:45,
532-555).

Implements the "ortho" convention documented by torch_harmonics:

    f_l^m = integral f(theta, phi) conj(Ybar_l^m) dOmega
          = 2*pi * sum_k w_k Pbar_l^m(x_k) * fhat_m(x_k)

with fhat the forward-normalized longitude rFFT, Pbar the orthonormalized
associated Legendre functions (Condon-Shortley phase included, scipy's lpmv
convention), and w_k the grid quadrature weights (Gauss-Legendre, or
Clenshaw-Curtis for the pole-inclusive equiangular grid).  Synthesis is the
exact adjoint/inverse (irfft with forward norm).

Deliberately independent of msfno_tpu: Legendre values come from
scipy.special.lpmv + gammaln normalization, Clenshaw-Curtis weights from
Trefethen's clencurt formula — so parity tests cross-validate
msfno_tpu/ops/{legendre,quadrature}.py rather than assuming them.

Exposes the attributes the reference touches: ``.weights`` on RealSHT and
``.pct`` on InverseRealSHT (the 1e5 rescaling hack mutates them,
sfnonet.py:550-555), and ``.float()`` via nn.Module.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
from scipy.special import gammaln, lpmv


def legendre_gauss_weights(n: int, a: float = -1.0, b: float = 1.0):
    """Gauss-Legendre nodes/weights on [a, b], north-to-south (descending x),
    matching torch_harmonics.quadrature.legendre_gauss_weights."""
    x, w = np.polynomial.legendre.leggauss(n)
    x = 0.5 * (b - a) * x + 0.5 * (b + a)
    w = 0.5 * (b - a) * w
    return x[::-1].copy(), w[::-1].copy()


def clenshaw_curtiss_weights(n: int, a: float = -1.0, b: float = 1.0):
    """Clenshaw-Curtis nodes/weights on the pole-inclusive equiangular grid
    (Trefethen, Spectral Methods in MATLAB, clencurt.m), north-to-south."""
    npts = n
    nseg = npts - 1
    theta = np.pi * np.arange(npts) / nseg
    x = np.cos(theta)
    w = np.zeros(npts)
    ii = np.arange(1, nseg)
    v = np.ones(nseg - 1)
    if nseg % 2 == 0:
        w[0] = w[-1] = 1.0 / (nseg**2 - 1)
        for k in range(1, nseg // 2):
            v -= 2.0 * np.cos(2.0 * k * theta[ii]) / (4.0 * k**2 - 1)
        v -= np.cos(nseg * theta[ii]) / (nseg**2 - 1)
    else:
        w[0] = w[-1] = 1.0 / nseg**2
        for k in range(1, (nseg - 1) // 2 + 1):
            v -= 2.0 * np.cos(2.0 * k * theta[ii]) / (4.0 * k**2 - 1)
    w[ii] = 2.0 * v / nseg
    x = 0.5 * (b - a) * x + 0.5 * (b + a)
    w = 0.5 * (b - a) * w
    return x, w


def _pbar(lmax: int, mmax: int, x: np.ndarray) -> np.ndarray:
    """Orthonormalized associated Legendre Pbar_l^m(x), shape (mmax, lmax,
    nlat), zero where l < m.  scipy lpmv includes the Condon-Shortley phase."""
    out = np.zeros((mmax, lmax, len(x)))
    for m in range(mmax):
        for l in range(m, lmax):
            norm = math.sqrt(
                (2 * l + 1)
                / (4.0 * np.pi)
                * math.exp(gammaln(l - m + 1) - gammaln(l + m + 1))
            )
            out[m, l] = norm * lpmv(m, l, x)
    return out


def _grid_nodes(grid: str, nlat: int):
    if grid == "legendre-gauss":
        return legendre_gauss_weights(nlat)
    if grid == "equiangular":
        return clenshaw_curtiss_weights(nlat)
    raise ValueError(f"unknown grid {grid!r}")


class RealSHT(nn.Module):
    def __init__(self, nlat, nlon, lmax=None, mmax=None, grid="legendre-gauss",
                 norm="ortho", csphase=True):
        super().__init__()
        assert norm == "ortho" and csphase
        self.nlat, self.nlon = nlat, nlon
        self.lmax = lmax or nlat
        self.mmax = mmax or nlon // 2 + 1
        self.grid = grid
        x, w = _grid_nodes(grid, nlat)
        pbar = _pbar(self.lmax, self.mmax, x)
        self.weights = torch.from_numpy(
            (2.0 * np.pi * pbar * w[None, None, :]).astype(np.float64)
        ).float()

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        # x: (..., nlat, nlon) real -> (..., lmax, mmax) complex
        fhat = torch.fft.rfft(x, dim=-1, norm="forward")[..., : self.mmax]
        w = self.weights.to(fhat.dtype)
        return torch.einsum("mlh,...hm->...lm", w, fhat)


class InverseRealSHT(nn.Module):
    def __init__(self, nlat, nlon, lmax=None, mmax=None, grid="legendre-gauss",
                 norm="ortho", csphase=True):
        super().__init__()
        assert norm == "ortho" and csphase
        self.nlat, self.nlon = nlat, nlon
        self.lmax = lmax or nlat
        self.mmax = mmax or nlon // 2 + 1
        self.grid = grid
        x, _ = _grid_nodes(grid, nlat)
        self.pct = torch.from_numpy(
            _pbar(self.lmax, self.mmax, x).astype(np.float64)
        ).float()

    def forward(self, c: torch.Tensor) -> torch.Tensor:
        # c: (..., lmax, mmax) complex -> (..., nlat, nlon) real
        xm = torch.einsum("mlh,...lm->...hm", self.pct.to(c.dtype), c)
        nfreq = self.nlon // 2 + 1
        if self.mmax < nfreq:
            pad = torch.zeros(
                (*xm.shape[:-1], nfreq - self.mmax), dtype=xm.dtype
            )
            xm = torch.cat([xm, pad], dim=-1)
        return torch.fft.irfft(xm, n=self.nlon, dim=-1, norm="forward")
