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

Interleaved mode layout (SURVEY section 7.4-3, VERDICT r2 item 6): with the
default `interleaved=True`, order m lives at position
  i = (m % P) * (M_pad / P) + m // P
so shard k holds the round-robin set {m : m == k (mod P)} in ascending order.
Two wins over contiguous blocks:
1. Triangular truncation gives order m only L - m live degrees; contiguous
   assignment hands shard 0 ~2x the live modes of shard P-1.  Round-robin
   makes every shard's live-mode census equal (+-1), so per-mode downstream
   work (SpectralConvS2's K-axis contraction) balances.
2. It makes a TRIANGULAR-BLOCKED Legendre contraction SPMD-compatible: the
   block {l < cut, m >= cut} of the weight tensor is structurally zero
   (l < m), and with round-robin every shard's orders below any cut form a
   static-size local prefix (ceil(cut / P) orders, the SAME on every shard).
   The Legendre stage then runs as `l_blocks` matmuls that skip the zero
   block — ~25% fewer FLOPs at l_blocks=2, ~37% at 4, identical shapes on
   every device (SPMD requires one program).  Contiguous assignment cannot
   trim: the live prefix length varies per shard.

The spectral m axis is then in PERMUTED order; `mode_perm` (position ->
original m) / `mode_inv` (m -> position) expose the layout, and
`to_canonical` gathers back the dense torch_harmonics rectangle.  Per-mode
consumers must index through `mode_inv` (SpectralConvS2 does); mode-pointwise
ops (the spectral MLP) are permutation-invariant and need nothing.
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


def _resolve_comm_dtype(comm_dtype: str | None, mxu_dtype: str):
    """Transport dtype for the all_to_all payloads.  Default: match the
    transform's compute tier — bf16 MXU tiers already round these exact
    coefficients to bf16 at the next matmul, so shipping fp32 re/im pairs
    over ICI doubles the wire bytes for no numeric gain (BASELINE.md
    round-5 comm table: 313-615 MB/shard/step of c64 at full resolution);
    fp32/tensorfloat tiers keep fp32 transport."""
    if comm_dtype is None:
        comm_dtype = (
            "bfloat16" if mxu_dtype == "bfloat16" else "float32"
        )
    return jnp.dtype(comm_dtype)


def interleave_perm(m_pad: int, p: int) -> np.ndarray:
    """Round-robin order-to-position permutation: perm[i] = original order at
    position i, with shard k = positions [k*q, (k+1)*q) holding orders
    {k, k+P, k+2P, ...} ascending (q = m_pad / P)."""
    q = m_pad // p
    i = np.arange(m_pad)
    return (i % q) * p + i // q


def _l_cuts(lmax: int, l_blocks: int) -> list[int]:
    """Monotone cut list [0, ..., lmax] splitting the degree axis into
    l_blocks near-equal blocks."""
    cuts = [round(b * lmax / l_blocks) for b in range(l_blocks + 1)]
    return sorted(set(cuts))


def _mode_layout(p: int, m_pad: int, lmax: int, interleaved: bool,
                 l_blocks: int):
    """Shared m-shard layout for the forward AND inverse transforms:
    (interleaved, l_blocks, mode_perm, mode_inv, cuts, nb).

    One definition keeps the two classes' index math in lockstep — a drift
    between them would corrupt sharded round-trips silently.

    - mode_perm (position -> original m) is round-robin when interleaved
      (triangular truncation's work skew balances across shards);
      mode_inv is its inverse.
    - cuts: l-block boundaries; nb[b]: per-block static local-order prefix.
      Orders at local positions [0, nb[b]) are the only ones with m < cut
      on EVERY shard (round-robin => local position j holds order
      j*P + k <= j*P + P - 1).  The prefix trim is only valid for
      round-robin (contiguous shards' live-prefix length varies per
      device — SPMD forbids that), so the dense fallback is used otherwise."""
    interleaved = interleaved and p > 1
    l_blocks = max(1, l_blocks) if interleaved else 1
    if interleaved:
        mode_perm = interleave_perm(m_pad, p)
        mode_inv = np.argsort(mode_perm)
    else:
        mode_perm = np.arange(m_pad)
        mode_inv = mode_perm
    q = m_pad // p
    cuts = _l_cuts(lmax, l_blocks)
    nb = (
        [min(q, -(-cut // p)) for cut in cuts[1:]]
        if interleaved
        else [q] * (len(cuts) - 1)
    )
    return interleaved, l_blocks, mode_perm, mode_inv, cuts, nb


class ShardedRealSHT:
    """Forward SHT over a mesh axis.  Call inside or outside jit; input
    (B, H, W, C) sharded over `axis` on H, output (B, L, M_pad, C) sharded
    over `axis` on M (in `mode_perm` order when interleaved).  Any nlat is
    supported (padded internally)."""

    def __init__(self, sht: RealSHT, mesh: Mesh, axis: str = "lat",
                 interleaved: bool = True, l_blocks: int = 2,
                 comm_dtype: str | None = None):
        global _constructions
        _constructions += 1
        self.sht = sht
        self.mesh = mesh
        self.axis = axis
        self.comm_dtype = _resolve_comm_dtype(comm_dtype, sht.mxu_dtype)
        self.p = mesh.shape[axis]
        self.h_pad = _round_up(sht.nlat, self.p)
        self.m_pad = _round_up(sht.mmax, self.p)
        (self.interleaved, self.l_blocks, self.mode_perm, self.mode_inv,
         self._cuts, self._nb) = _mode_layout(
            self.p, self.m_pad, sht.lmax, interleaved, l_blocks
        )
        # (M_pad, L, H_pad) fp32; zero rows/cols for padded orders/latitudes
        weights = _pad_axis(
            _pad_axis(sht.weights, self.m_pad, 0), self.h_pad, 2
        )
        cmat, smat = _dft_analysis_matrices(sht.nlon, sht.mmax)
        cmat = _pad_axis(cmat, self.m_pad, 1)
        smat = _pad_axis(smat, self.m_pad, 1)
        self.weights = weights[self.mode_perm]
        # merged truncated-DFT analysis matrix (W, 2*M_pad) = [C | -S] in
        # mode_perm column order: the local longitude stage is ONE MXU
        # matmul (XLA's rfft lowers to the VPU, ~20x slower at full res —
        # same redesign as ops/sht.py, here per latitude band)
        self.dft = np.concatenate(
            [cmat[:, self.mode_perm], -smat[:, self.mode_perm]], axis=1
        )

    def to_canonical(self, coeffs: jax.Array) -> jax.Array:
        """Gather the dense (..., L, mmax, C) torch_harmonics layout."""
        return coeffs[..., self.mode_inv[: self.sht.mmax], :]

    def __call__(self, x: jax.Array) -> jax.Array:
        dft = jnp.asarray(self.dft)
        m_pad = self.m_pad
        axis = self.axis
        q = m_pad // self.p
        cuts, nbs = self._cuts, self._nb
        prec = _matmul_precision(self.sht.mxu_dtype)
        comm_dt = self.comm_dtype
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
            # transpose shards: m gets split, h gets gathered.  The payload
            # travels as a stacked re/im REAL array in comm_dtype (bf16 on
            # the bf16 tier halves the wire bytes; see _resolve_comm_dtype),
            # with the re/im pair on its own axis so the m-split stays
            # aligned with the mode layout.
            fri = jnp.stack(
                [f[..., :m_pad, :], f[..., m_pad:, :]], axis=2
            ).astype(comm_dt)  # (B, H_pad/P, 2, M_pad, C)
            fri = jax.lax.all_to_all(
                fri, axis, split_axis=3, concat_axis=1, tiled=True
            )  # (B, H_pad, 2, M_pad/P, C)
            fhat = jax.lax.complex(
                fri[:, :, 0].astype(jnp.float32),
                fri[:, :, 1].astype(jnp.float32),
            )

            def legendre(part):
                # triangular-blocked contraction: block b covers degrees
                # l in [cuts[b], cuts[b+1]) where only the local order
                # prefix [0, nbs[b]) can be live; the skipped tail is
                # structurally zero (l < m) so the output is padded with
                # exact zeros.  One block (nbs[b] == q) == the dense einsum.
                outs = []
                for b in range(len(nbs)):
                    lo, hi, nb = cuts[b], cuts[b + 1], nbs[b]
                    ob = jnp.einsum(
                        "mlh,bhmc->blmc", w[:nb, lo:hi], part[..., :nb, :],
                        precision=prec,
                    )
                    if nb < q:
                        pad = [(0, 0)] * ob.ndim
                        pad[-2] = (0, q - nb)
                        ob = jnp.pad(ob, pad)
                    outs.append(ob)
                return outs[0] if len(outs) == 1 else jnp.concatenate(
                    outs, axis=-3
                )

            re = legendre(jnp.real(fhat))
            im = legendre(jnp.imag(fhat))
            return jax.lax.complex(re, im)

        return shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(None, self.axis, None, None), P(self.axis, None, None)),
            out_specs=P(None, None, self.axis, None),
            check_vma=False,
        )(x, jnp.asarray(self.weights))


class ShardedInverseRealSHT:
    """Inverse SHT over a mesh axis: (B, L, M_pad, C) m-sharded (mode_perm
    order) -> (B, H, W, C) latitude-sharded.  Any nlat is supported (computed
    on the padded grid, sliced back after the shard_map)."""

    def __init__(self, isht: InverseRealSHT, mesh: Mesh, axis: str = "lat",
                 interleaved: bool = True, l_blocks: int = 2,
                 comm_dtype: str | None = None):
        self.isht = isht
        self.mesh = mesh
        self.axis = axis
        self.comm_dtype = _resolve_comm_dtype(comm_dtype, isht.mxu_dtype)
        self.p = mesh.shape[axis]
        self.h_pad = _round_up(isht.nlat, self.p)
        self.m_pad = _round_up(isht.mmax, self.p)
        (self.interleaved, self.l_blocks, self.mode_perm, self.mode_inv,
         self._cuts, self._nb) = _mode_layout(
            self.p, self.m_pad, isht.lmax, interleaved, l_blocks
        )
        pct = _pad_axis(_pad_axis(isht.pct, self.m_pad, 0), self.h_pad, 2)
        ci, si = _dft_synthesis_matrices(isht.nlon, isht.mmax)
        ci = _pad_axis(ci, self.m_pad, 0)
        si = _pad_axis(si, self.m_pad, 0)
        self.pct = pct[self.mode_perm]
        # merged synthesis matrix (2*M_pad, W) = [Ci; -Si] (halves padded to
        # M_pad with zero rows, rows in mode_perm order): the local longitude
        # stage is one matmul and the mode truncation is implicit — no irfft,
        # no nfreq zero-pad
        self.dft = np.concatenate(
            [ci[self.mode_perm], -si[self.mode_perm]], axis=0
        )

    def __call__(self, coeffs: jax.Array) -> jax.Array:
        dft = jnp.asarray(self.dft)
        axis = self.axis
        nlat = self.isht.nlat
        q = self.m_pad // self.p
        cuts, nbs = self._cuts, self._nb
        prec = _matmul_precision(self.isht.mxu_dtype)

        def local(cb, w):
            # cb: (B, L, M_pad/P, C); w: this device's (M_pad/P, L, H_pad)
            # synthesis-pct chunk (m-sharded via in_specs — see the forward
            # transform's rationale)
            def legendre(part):
                # mirrored triangular blocking: degrees [cuts[b], cuts[b+1])
                # only reach the local order prefix [0, nbs[b]); orders past
                # it have zero pct rows there AND zero coefficients (l < m)
                acc = None
                for b in range(len(nbs)):
                    lo, hi, nb = cuts[b], cuts[b + 1], nbs[b]
                    ob = jnp.einsum(
                        "mlh,blmc->bhmc", w[:nb, lo:hi],
                        part[..., lo:hi, :nb, :], precision=prec,
                    )
                    if nb < q:
                        pad = [(0, 0)] * ob.ndim
                        pad[-2] = (0, q - nb)
                        ob = jnp.pad(ob, pad)
                    acc = ob if acc is None else acc + ob
                return acc

            re = legendre(jnp.real(cb))
            im = legendre(jnp.imag(cb))
            # transpose shards back: h gets split, m gets gathered — stacked
            # re/im real payload in comm_dtype (see the forward transform)
            xri = jnp.stack([re, im], axis=2).astype(self.comm_dtype)
            xri = jax.lax.all_to_all(
                xri, axis, split_axis=1, concat_axis=3, tiled=True
            )  # (B, H_pad/P, 2, M_pad, C)
            cat = jnp.concatenate(
                [xri[:, :, 0], xri[:, :, 1]], axis=-2
            ).astype(jnp.float32)
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
                            axis: str = "lat", interleaved: bool = True,
                            l_blocks: int = 2,
                            comm_dtype: str | None = None):
    return (
        ShardedRealSHT(sht, mesh, axis, interleaved, l_blocks, comm_dtype),
        ShardedInverseRealSHT(isht, mesh, axis, interleaved, l_blocks,
                              comm_dtype),
    )
