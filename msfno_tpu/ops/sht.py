"""Real spherical harmonic transforms (SHT) for TPU.

TPU-native replacement for torch_harmonics' RealSHT / InverseRealSHT as used by
the reference (MSFNO/Models/sfno/sfnonet.py:532-555).  Structure:

    forward:  real rFFT over longitude  ->  associated-Legendre matmul over
              latitude (quadrature-weighted), per longitudinal order m
    inverse:  Legendre synthesis matmul  ->  inverse real FFT over longitude

Design notes (TPU-first):
- channels-last layout (..., H, W, C): the Legendre stage is a batched matmul
  (L x H) @ (H x B*C) per order m -> MXU-friendly, with C on the lane axis.
- the Pbar weight tensors are precomputed host-side in float64
  (msfno_tpu/ops/legendre.py) and baked into the jitted program as fp32
  constants; nothing is recomputed per step.
- the transform runs in fp32 regardless of the surrounding compute dtype,
  mirroring the reference's fp32 autocast islands
  (MSFNO/Models/sfno/layers.py:627-639).
- complex arithmetic is expressed as paired real einsums so XLA lowers it to
  two real matmuls instead of complex-algebra scalar code.

The ``spectral_rescale`` knob reproduces the reference's ad-hoc 1e5 weight
rescaling for gradient conditioning (sfnonet.py:550-555): forward quadrature
weights are multiplied by the factor, inverse synthesis weights divided, so
round trips are unchanged while spectral activations live at a larger scale.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from msfno_tpu.ops.legendre import legendre_matrix
from msfno_tpu.ops.quadrature import grid_quadrature


def _matmul_precision(mxu_dtype: str) -> jax.lax.Precision:
    """Map the mxu_dtype knob to an XLA matmul precision (see RealSHT)."""
    return {
        "bfloat16": jax.lax.Precision.DEFAULT,
        "tensorfloat": jax.lax.Precision.HIGH,
        "float32": jax.lax.Precision.HIGHEST,
    }[str(mxu_dtype)]


def _resolve_modes(nlat: int, nlon: int, lmax, mmax) -> tuple[int, int]:
    lmax = lmax or nlat
    mmax = mmax or nlon // 2 + 1
    return int(lmax), int(mmax)


@functools.lru_cache(maxsize=16)
def _dft_analysis_matrices(nlon: int, mmax: int) -> tuple[np.ndarray, np.ndarray]:
    """(C, S) with C[w, m] = cos(2 pi m w / W)/W, S[w, m] = sin(.)/W so that
    fhat_m = x @ C - i * x @ S equals rfft(x, norm="forward")[..., :mmax].

    Rationale (TPU-first): the SFNO truncates to mmax << nlon/2 longitude
    orders, so the truncated DFT is a skinny matmul that runs on the MXU at
    matmul rate; XLA's rfft lowers to the VPU and measures ~20x slower at
    721x1440x256 (see tools/profile_parts.py).
    """
    w = np.arange(nlon)[:, None].astype(np.float64)
    m = np.arange(mmax)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * w * m / nlon
    return (
        (np.cos(ang) / nlon).astype(np.float32),
        (np.sin(ang) / nlon).astype(np.float32),
    )


@functools.lru_cache(maxsize=16)
def _dft_synthesis_matrices(nlon: int, mmax: int) -> tuple[np.ndarray, np.ndarray]:
    """(Ci, Si) with Ci[m, w] = k_m cos(2 pi m w / W), Si[m, w] = k_m sin(.),
    k = 1 for m = 0 and the Nyquist bin m = W/2 (whose Si row is zeroed: its
    imaginary part is discarded, matching irfft), k = 2 otherwise:
    x_w = sum_m re_m Ci[m, w] - im_m Si[m, w] == irfft(pad(fhat), norm="forward").
    """
    if mmax > nlon // 2 + 1:
        raise ValueError("matmul synthesis requires mmax <= nlon/2 + 1")
    w = np.arange(nlon)[None, :].astype(np.float64)
    m = np.arange(mmax)[:, None].astype(np.float64)
    ang = 2.0 * np.pi * w * m / nlon
    nyquist = m == nlon // 2
    k = np.where((m == 0) | (nyquist & (nlon % 2 == 0)), 1.0, 2.0)
    si = k * np.sin(ang)
    si[np.broadcast_to(nyquist & (nlon % 2 == 0), si.shape)] = 0.0
    return (k * np.cos(ang)).astype(np.float32), si.astype(np.float32)


@functools.lru_cache(maxsize=16)
def _dft_analysis_merged(nlon: int, mmax: int) -> np.ndarray:
    """(W, 2M) = [C | -S]: one matmul yields [re | im] along the mode axis,
    so the full-res field is read ONCE instead of once per cos/sin einsum
    (the analysis DFT is traffic-bound at 721x1440x256, not FLOP-bound)."""
    cmat, smat = _dft_analysis_matrices(nlon, mmax)
    return np.concatenate([cmat, -smat], axis=1)


@functools.lru_cache(maxsize=16)
def _dft_synthesis_merged(nlon: int, mmax: int) -> np.ndarray:
    """(2M, W) = [Ci; -Si]: x = [re | im] @ [Ci; -Si] in ONE matmul writing
    the full-res grid once — the separate re@Ci - im@Si form materializes
    two full-res products plus the subtraction (~3x the HBM traffic)."""
    ci, si = _dft_synthesis_matrices(nlon, mmax)
    return np.concatenate([ci, -si], axis=0)


@functools.lru_cache(maxsize=16)
def _sht_weights(
    nlat: int, nlon: int, lmax: int, mmax: int, grid: str, csphase: bool
) -> tuple[np.ndarray, np.ndarray]:
    """(analysis_weights, synthesis_pct), both (mmax, lmax, nlat) fp64.

    analysis_weights[m, l, k] = 2*pi * w_k * Pbar_l^m(x_k)
    synthesis_pct[m, l, k]    = Pbar_l^m(x_k)

    With orthonormal Pbar (legendre.py), analysis of a band-limited field
    followed by synthesis is exact on Gauss grids:
      2*pi * sum_k w_k Pbar_l^m Pbar_l'^m = delta_{l l'}.
    """
    x, w = grid_quadrature(grid, nlat)
    pct = legendre_matrix(lmax, mmax, x, csphase=csphase)
    analysis = 2.0 * np.pi * pct * w[None, None, :]
    return analysis, pct


@dataclasses.dataclass(frozen=True)
class RealSHT:
    """Forward real SHT: (..., H, W, C) real -> (..., L, M, C) complex64.

    Mirrors torch_harmonics.RealSHT semantics (triangular truncation stored as
    a dense (L, M) rectangle with zeros where l < m).
    """

    nlat: int
    nlon: int
    lmax: int | None = None
    mmax: int | None = None
    grid: str = "legendre-gauss"
    csphase: bool = True
    spectral_rescale: float = 1.0
    lon_dft: str = "matmul"  # "matmul" (MXU, truncated DFT) | "fft" (XLA rfft)
    # Numerics of the DFT/Legendre matmuls.  Measured on v5e (tools/
    # bench_precision_ladder.py + /tmp precision probe, 2026-08-17): XLA's
    # DEFAULT f32 matmul rounds inputs to bf16 (1 pass, rel ~2e-3 — bit-
    # identical to feeding bf16 inputs), HIGH is bf16x3 (rel ~1e-5, ~1.13x
    # time), HIGHEST is true f32 (rel ~2e-7, ~1.4x).  Explicit .astype casts
    # are therefore pure overhead; the knob now maps to matmul precision:
    #   "bfloat16"    -> precision DEFAULT (1-pass bf16; fast path)
    #   "tensorfloat" -> precision HIGH    (bf16x3; near-f32 at ~13% cost)
    #   "float32"     -> precision HIGHEST (true f32; reference-faithful)
    mxu_dtype: str = "float32"

    def __post_init__(self):
        lmax, mmax = _resolve_modes(self.nlat, self.nlon, self.lmax, self.mmax)
        object.__setattr__(self, "lmax", lmax)
        object.__setattr__(self, "mmax", mmax)

    @functools.cached_property
    def weights(self) -> np.ndarray:
        """(mmax, lmax, nlat) fp32 analysis weights (incl. spectral_rescale)."""
        analysis, _ = _sht_weights(
            self.nlat, self.nlon, self.lmax, self.mmax, self.grid, self.csphase
        )
        return np.asarray(analysis * self.spectral_rescale, dtype=np.float32)

    @functools.cached_property
    def merged_analysis(self) -> np.ndarray:
        """(nlon, 2*mmax) merged [C | -S] analysis matrix — the DFT operand
        of the fused encoder->spectral kernel (ops/pallas/grid_mlp.py)."""
        return _dft_analysis_merged(self.nlon, self.mmax)

    def legendre_stacked(self, f: jax.Array) -> jax.Array:
        """Legendre analysis ONLY: (..., H, 2M, C) stacked [re | im]
        longitude modes (the merged-DFT layout) -> (..., L, M, C) complex.
        Used when the longitude stage already ran inside a fused kernel."""
        if f.shape[-2] != 2 * self.mmax or f.shape[-3] != self.nlat:
            raise ValueError(
                f"expected (..., {self.nlat}, {2 * self.mmax}, C), got {f.shape}"
            )
        prec = _matmul_precision(self.mxu_dtype)
        w = jnp.asarray(self.weights)
        f = f.astype(jnp.float32)
        re = jnp.einsum("mlh,...hmc->...lmc", w, f[..., : self.mmax, :],
                        precision=prec, preferred_element_type=jnp.float32)
        im = jnp.einsum("mlh,...hmc->...lmc", w, f[..., self.mmax :, :],
                        precision=prec, preferred_element_type=jnp.float32)
        return jax.lax.complex(re, im)

    def __call__(self, x: jax.Array) -> jax.Array:
        if x.shape[-3] != self.nlat or x.shape[-2] != self.nlon:
            raise ValueError(
                f"expected (..., {self.nlat}, {self.nlon}, C), got {x.shape}"
            )
        prec = _matmul_precision(self.mxu_dtype)
        ein = lambda spec, a, b: jnp.einsum(
            spec, a, b, precision=prec,
            preferred_element_type=jnp.float32,
        )
        x = x.astype(jnp.float32)
        # Longitude analysis: c_m = (1/nlon) sum_j f e^{-i m phi_j}.
        if self.lon_dft == "pallas" and self.mmax <= self.nlon // 2 + 1:
            from msfno_tpu.ops.pallas.dft import dft_analysis

            cmat, smat = _dft_analysis_matrices(self.nlon, self.mmax)
            fr, fi = dft_analysis(
                x, jnp.asarray(cmat), jnp.asarray(smat), mxu_dtype=self.mxu_dtype
            )
        elif self.lon_dft == "matmul" and self.mmax <= self.nlon // 2 + 1:
            cs = _dft_analysis_merged(self.nlon, self.mmax)
            f = ein("...hwc,wm->...hmc", x, jnp.asarray(cs))
            fr, fi = f[..., : self.mmax, :], f[..., self.mmax :, :]
        else:
            fhat = jnp.fft.rfft(x, axis=-2, norm="forward")[..., : self.mmax, :]
            fr, fi = jnp.real(fhat), jnp.imag(fhat)
        w = jnp.asarray(self.weights)
        re = ein("mlh,...hmc->...lmc", w, fr)
        im = ein("mlh,...hmc->...lmc", w, fi)
        return jax.lax.complex(re, im)


@dataclasses.dataclass(frozen=True)
class InverseRealSHT:
    """Inverse real SHT: (..., L, M, C) complex -> (..., H, W, C) real fp32."""

    nlat: int
    nlon: int
    lmax: int | None = None
    mmax: int | None = None
    grid: str = "legendre-gauss"
    csphase: bool = True
    spectral_rescale: float = 1.0
    lon_dft: str = "matmul"  # "matmul" (MXU, truncated DFT) | "fft" (XLA irfft)
    mxu_dtype: str = "float32"  # see RealSHT.mxu_dtype

    def __post_init__(self):
        lmax, mmax = _resolve_modes(self.nlat, self.nlon, self.lmax, self.mmax)
        object.__setattr__(self, "lmax", lmax)
        object.__setattr__(self, "mmax", mmax)

    @functools.cached_property
    def pct(self) -> np.ndarray:
        """(mmax, lmax, nlat) fp32 synthesis weights (incl. 1/spectral_rescale)."""
        _, pct = _sht_weights(
            self.nlat, self.nlon, self.lmax, self.mmax, self.grid, self.csphase
        )
        return np.asarray(pct / self.spectral_rescale, dtype=np.float32)

    @functools.cached_property
    def pct2(self) -> np.ndarray:
        """(2*mmax, lmax, nlat): pct tiled over the stacked [re | im] mode
        axis, so one Legendre-synthesis einsum emits the (..., H, 2M, C)
        layout the merged DFT consumes — no grid-height concat of re/im."""
        return np.concatenate([self.pct, self.pct], axis=0)

    @functools.cached_property
    def merged_matrix_t(self) -> np.ndarray:
        """(nlon, 2*mmax) fp32: the transposed merged synthesis matrix, the
        DFT operand of the fused spectral->output decoder kernel
        (ops/pallas/spectral_decoder.py)."""
        return np.ascontiguousarray(
            _dft_synthesis_merged(self.nlon, self.mmax).T
        )

    @functools.cached_property
    def mode_power_weights(self) -> np.ndarray:
        """(2*mmax,) fp32 omega with sum_w x_w^2 = nlon * sum_m omega_m hm_m^2
        for x = hm @ merged matrix — diag(M M^T)/nlon computed numerically in
        float64, so the k_m doubling and the zeroed m=0 sin row are automatic
        (off-diagonals of M M^T vanish by DFT orthogonality; pinned by
        tests/test_spectral_decoder.py)."""
        mat = _dft_synthesis_merged(self.nlon, self.mmax).astype(np.float64)
        return (np.einsum("mw,mw->m", mat, mat) / self.nlon).astype(np.float32)

    def synthesis_hm(self, coeffs: jax.Array) -> jax.Array:
        """Legendre synthesis ONLY: (..., L, M, C) complex -> the
        (..., H, 2M, C) fp32 stacked [re | im] intermediate that the merged
        inverse DFT (or the fused decoder kernel) consumes."""
        if coeffs.shape[-3] != self.lmax or coeffs.shape[-2] != self.mmax:
            raise ValueError(
                f"expected (..., {self.lmax}, {self.mmax}, C), got {coeffs.shape}"
            )
        if self.lon_dft != "matmul" or self.mmax > self.nlon // 2 + 1:
            raise ValueError("synthesis_hm requires the matmul DFT path")
        coeffs = coeffs.astype(jnp.complex64)
        prec = _matmul_precision(self.mxu_dtype)
        cat = jnp.concatenate([jnp.real(coeffs), jnp.imag(coeffs)], axis=-2)
        return jnp.einsum(
            "mlh,...lmc->...hmc", jnp.asarray(self.pct2), cat,
            precision=prec, preferred_element_type=jnp.float32,
        )

    def __call__(self, coeffs: jax.Array) -> jax.Array:
        if coeffs.shape[-3] != self.lmax or coeffs.shape[-2] != self.mmax:
            raise ValueError(
                f"expected (..., {self.lmax}, {self.mmax}, C), got {coeffs.shape}"
            )
        coeffs = coeffs.astype(jnp.complex64)
        prec = _matmul_precision(self.mxu_dtype)
        ein = lambda spec, a, b: jnp.einsum(
            spec, a, b, precision=prec,
            preferred_element_type=jnp.float32,
        )
        if self.lon_dft == "matmul" and self.mmax <= self.nlon // 2 + 1:
            # stacked path: concat re/im at SPECTRAL size, then ONE Legendre
            # einsum (pct2) and ONE DFT matmul — a single full-res write and
            # no (H, 2M)-sized concat (see _dft_synthesis_merged)
            hm = self.synthesis_hm(coeffs)
            mat = _dft_synthesis_merged(self.nlon, self.mmax)
            return ein("...hmc,mw->...hwc", hm, jnp.asarray(mat))
        p = jnp.asarray(self.pct)
        re = ein("mlh,...lmc->...hmc", p, jnp.real(coeffs))
        im = ein("mlh,...lmc->...hmc", p, jnp.imag(coeffs))
        if self.lon_dft == "pallas" and self.mmax <= self.nlon // 2 + 1:
            from msfno_tpu.ops.pallas.dft import dft_synthesis

            ci, si = _dft_synthesis_matrices(self.nlon, self.mmax)
            return dft_synthesis(
                re, im, jnp.asarray(ci), jnp.asarray(si), mxu_dtype=self.mxu_dtype
            )
        xm = jax.lax.complex(re, im)
        nfreq = self.nlon // 2 + 1
        if self.mmax < nfreq:
            pad = [(0, 0)] * xm.ndim
            pad[-2] = (0, nfreq - self.mmax)
            xm = jnp.pad(xm, pad)
        # norm="forward": no 1/n on the inverse (it was applied in analysis).
        return jnp.fft.irfft(xm, n=self.nlon, axis=-2, norm="forward")
