"""Fused complex spectral MLP — Pallas TPU kernel.

The SFNO's non-linear filter applies, per retained (l, m) mode, a complex MLP
whose weights are shared across modes (reference SpectralAttentionS2.
forward_mlp, MSFNO/Models/sfno/layers.py:615-631): L layers of complex
matmul + ComplexReLU("real"), then a projection back to embed_dim.

XLA's default lowering round-trips the (N_modes, hidden) activations to HBM
between layers.  This kernel tiles the flattened mode axis, keeps ALL layer
weights resident in VMEM (~6 MB at full size: 256->512->512->512->256 complex
pairs), and runs the whole layer stack per tile on the MXU with fp32
accumulation — one HBM read of x and one write of y total.

Complex arithmetic is explicit re/im (TPU has no native complex MXU path).
The kernel packs the complex matmul into ONE double-width real matmul:

  [hr | hi] @ [[wr, wi], [-wi, wr]] = [hr@wr - hi@wi | hr@wi + hi@wr]

i.e. a (T, 2*d_in) x (2*d_in, 2*d_out) product per layer instead of four
separate (T, d_in) x (d_in, d_out) dots — same FLOPs, but one large MXU op
the scheduler can pipeline (measured ~1.5x the 4-dot variant at full size).
ComplexReLU("real") (activations.py:42-46) — LeakyReLU on re, im untouched —
becomes a branchless lane-masked select over the packed columns.

Backward: custom_vjp differentiates an equivalent jnp reference
implementation (mode-pointwise matmuls XLA already handles well), so training
gets the fused forward and a standard backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msfno_tpu.ops.pallas import kernel_mxu_dtype

TILE_N = 256
# packed double-width matmul kernel (default) vs the original 4-dot kernel;
# module-level so benches can A/B both paths
PACKED = True
# 3-GEMM Karatsuba complex multiply: 25% fewer MXU FLOPs than the packed
# 4-GEMM-equivalent form, at the cost of three smaller dots per layer plus
# VPU adds.  Measured in the full fast-tier in-scan step (tools/
# bench_karatsuba_model.py, 2026-08-20): 23.47 -> 22.03 ms/step; single-
# step drift vs exact 1.75e-2 against packed's 1.66e-2 — same bf16 class
# (the precomputed weight sums carry one extra bf16 rounding).  Default ON;
# module-level so benches can A/B.
KARATSUBA = True
# fused Pallas input-gradient kernel (bf16 path) vs jnp-reference VJP;
# module-level so benches can A/B the backward alone
PALLAS_BWD = True


def _mlp_reference(xr, xi, ws, negative_slope: float):
    """jnp reference: xr/xi (N, C); ws = [(wr, wi), ...]; last layer has no
    activation (wout)."""
    hr, hi = xr, xi
    n_layers = len(ws)
    for idx, (wr, wi) in enumerate(ws):
        nr = hr @ wr - hi @ wi
        ni = hr @ wi + hi @ wr
        if idx < n_layers - 1:
            nr = jax.nn.leaky_relu(nr, negative_slope)
        hr, hi = nr, ni
    return hr, hi


def _make_packed_kernel(n_layers: int, negative_slope: float, mxu_dtype,
                        d_outs: tuple[int, ...]):
    """Packed-complex kernel: x tile (T, 2*c_in) = [re | im] columns; one
    packed weight ref (2*d_in, 2*d_out) per layer, already cast to mxu_dtype
    at call level (no per-tile casts)."""

    def kernel(x_ref, *refs):
        w_refs = refs[:n_layers]
        out_ref = refs[n_layers]
        h = x_ref[:]
        for idx in range(n_layers):
            h2 = jnp.dot(
                h.astype(mxu_dtype), w_refs[idx][:],
                preferred_element_type=jnp.float32,
            )
            if idx < n_layers - 1:
                # LeakyReLU on the re half (columns < d_out), identity on im
                col = jax.lax.broadcasted_iota(jnp.int32, h2.shape, 1)
                h2 = jnp.where(
                    (col < d_outs[idx]) & (h2 < 0), negative_slope * h2, h2
                )
            h = h2
        out_ref[:] = h

    return kernel


def _make_kernel(n_layers: int, negative_slope: float, mxu_dtype):
    """mxu_dtype=bfloat16 feeds the MXU at its native rate (~4x the fp32
    throughput on v5e) while keeping fp32 accumulation and fp32 activations;
    fp32 reproduces the reference's full-precision spectral path."""

    def kernel(xr_ref, xi_ref, *refs):
        # refs: wr0, wi0, wr1, wi1, ..., out_r, out_i
        w_refs = refs[: 2 * n_layers]
        out_r, out_i = refs[2 * n_layers], refs[2 * n_layers + 1]
        hr = xr_ref[:]
        hi = xi_ref[:]
        for idx in range(n_layers):
            wr = w_refs[2 * idx][:].astype(mxu_dtype)
            wi = w_refs[2 * idx + 1][:].astype(mxu_dtype)
            ar = hr.astype(mxu_dtype)
            ai = hi.astype(mxu_dtype)
            nr = jnp.dot(ar, wr, preferred_element_type=jnp.float32) - jnp.dot(
                ai, wi, preferred_element_type=jnp.float32
            )
            ni = jnp.dot(ar, wi, preferred_element_type=jnp.float32) + jnp.dot(
                ai, wr, preferred_element_type=jnp.float32
            )
            if idx < n_layers - 1:
                nr = jnp.where(nr >= 0, nr, negative_slope * nr)
            hr, hi = nr, ni
        out_r[:] = hr
        out_i[:] = hi

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("negative_slope", "interpret", "mxu_dtype", "tile_n"),
)
def _packed_call(xr, xi, *flat_ws, negative_slope: float = 0.0,
                 interpret: bool = False, mxu_dtype: str = "float32",
                 tile_n: int = 512):
    """Packed-complex fused MLP (see module docstring)."""
    n_layers = len(flat_ws) // 2
    n, c_in = xr.shape
    c_out = flat_ws[-2].shape[1]
    md = kernel_mxu_dtype(mxu_dtype)

    x = jnp.concatenate([xr, xi], axis=1)
    n_pad = -n % tile_n
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0)))
    n_tot = n + n_pad

    packed_ws, d_outs = [], []
    for k in range(n_layers):
        wr, wi = flat_ws[2 * k], flat_ws[2 * k + 1]
        top = jnp.concatenate([wr, wi], axis=1)
        bot = jnp.concatenate([-wi, wr], axis=1)
        packed_ws.append(jnp.concatenate([top, bot], axis=0).astype(md))
        d_outs.append(wr.shape[1])

    kernel = _make_packed_kernel(n_layers, negative_slope, md, tuple(d_outs))
    x_spec = pl.BlockSpec(
        (tile_n, 2 * c_in), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    w_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in packed_ws
    ]
    out_spec = pl.BlockSpec(
        (tile_n, 2 * c_out), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    flops = 0
    d_in = c_in
    for k in range(n_layers):
        d_out = flat_ws[2 * k].shape[1]
        flops += n_tot * d_in * d_out * 8  # packed (2d_in)x(2d_out), 2 flops/MAC
        d_in = d_out

    out = pl.pallas_call(
        kernel,
        grid=(n_tot // tile_n,),
        in_specs=[x_spec] + w_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_tot, 2 * c_out), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (2 * n_tot * (c_in + c_out))
            + sum(w.dtype.itemsize * w.size for w in packed_ws),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, *packed_ws)
    return out[:n, :c_out], out[:n, c_out:]


@functools.partial(
    jax.jit, static_argnames=("negative_slope", "interpret", "mxu_dtype")
)
def _fused_call(xr, xi, *flat_ws, negative_slope: float = 0.0,
                interpret: bool = False, mxu_dtype: str = "float32"):
    n_layers = len(flat_ws) // 2
    n, c_in = xr.shape
    c_out = flat_ws[-2].shape[1]
    n_pad = -n % TILE_N
    if n_pad:
        xr = jnp.pad(xr, ((0, n_pad), (0, 0)))
        xi = jnp.pad(xi, ((0, n_pad), (0, 0)))
    n_tot = n + n_pad

    kernel = _make_kernel(n_layers, negative_slope, kernel_mxu_dtype(mxu_dtype))
    x_spec = pl.BlockSpec((TILE_N, c_in), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in flat_ws
    ]
    out_spec = pl.BlockSpec((TILE_N, c_out), lambda i: (i, 0), memory_space=pltpu.VMEM)

    flops = 0
    d_in = c_in
    for k in range(n_layers):
        d_out = flat_ws[2 * k].shape[1]
        flops += n_tot * d_in * d_out * 8  # 4 real matmuls x 2 flops/MAC
        d_in = d_out

    out_r, out_i = pl.pallas_call(
        kernel,
        grid=(n_tot // TILE_N,),
        in_specs=[x_spec, x_spec] + w_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n_tot, c_out), jnp.float32),
            jax.ShapeDtypeStruct((n_tot, c_out), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (2 * n_tot * (c_in + c_out)) + sum(
                4 * w.size for w in flat_ws
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xr, xi, *flat_ws)
    if n_pad:
        out_r, out_i = out_r[:n], out_i[:n]
    return out_r, out_i


def _make_karatsuba_kernel(n_layers: int, negative_slope: float, mxu_dtype):
    """3-GEMM complex multiply per layer (Karatsuba):

        k1 = (hr + hi) @ wr,  k2 = hr @ (wi - wr),  k3 = hi @ (wr + wi)
        re = k1 - k3,         im = k1 + k2

    The weight combinations are precomputed at call level, so the kernel
    runs 3 (T, d_in) x (d_in, d_out) dots — 3/4 the MXU work of the packed
    (T, 2d_in) x (2d_in, 2d_out) form — plus three VPU adds."""

    def kernel(xr_ref, xi_ref, *refs):
        # refs: wr0, wd0, ws0, wr1, ... , out_r, out_i
        w_refs = refs[: 3 * n_layers]
        out_r, out_i = refs[3 * n_layers], refs[3 * n_layers + 1]
        hr = xr_ref[:]
        hi = xi_ref[:]
        for idx in range(n_layers):
            wr = w_refs[3 * idx][:]
            wd = w_refs[3 * idx + 1][:]
            ws = w_refs[3 * idx + 2][:]
            k1 = jnp.dot((hr + hi).astype(mxu_dtype), wr,
                         preferred_element_type=jnp.float32)
            k2 = jnp.dot(hr.astype(mxu_dtype), wd,
                         preferred_element_type=jnp.float32)
            k3 = jnp.dot(hi.astype(mxu_dtype), ws,
                         preferred_element_type=jnp.float32)
            nr = k1 - k3
            ni = k1 + k2
            if idx < n_layers - 1:
                nr = jnp.where(nr >= 0, nr, negative_slope * nr)
            hr, hi = nr, ni
        out_r[:] = hr
        out_i[:] = hi

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("negative_slope", "interpret", "mxu_dtype", "tile_n"),
)
def _karatsuba_call(xr, xi, *flat_ws, negative_slope: float = 0.0,
                    interpret: bool = False, mxu_dtype: str = "float32",
                    tile_n: int = 512):
    n_layers = len(flat_ws) // 2
    n, c_in = xr.shape
    c_out = flat_ws[-2].shape[1]
    md = kernel_mxu_dtype(mxu_dtype)

    n_pad = -n % tile_n
    if n_pad:
        xr = jnp.pad(xr, ((0, n_pad), (0, 0)))
        xi = jnp.pad(xi, ((0, n_pad), (0, 0)))
    n_tot = n + n_pad

    kws = []
    for k in range(n_layers):
        wr, wi = flat_ws[2 * k], flat_ws[2 * k + 1]
        kws += [wr.astype(md), (wi - wr).astype(md), (wr + wi).astype(md)]

    kernel = _make_karatsuba_kernel(n_layers, negative_slope, md)
    x_spec = pl.BlockSpec((tile_n, c_in), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    w_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in kws
    ]
    out_spec = pl.BlockSpec((tile_n, c_out), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    flops = 0
    d_in = c_in
    for k in range(n_layers):
        d_out = flat_ws[2 * k].shape[1]
        flops += n_tot * d_in * d_out * 6  # 3 real matmuls x 2 flops/MAC
        d_in = d_out

    out_r, out_i = pl.pallas_call(
        kernel,
        grid=(n_tot // tile_n,),
        in_specs=[x_spec, x_spec] + w_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n_tot, c_out), jnp.float32),
            jax.ShapeDtypeStruct((n_tot, c_out), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (2 * n_tot * (c_in + c_out))
            + sum(w.dtype.itemsize * w.size for w in kws),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xr, xi, *kws)
    return out_r[:n], out_i[:n]


def _make_packed_bwd_kernel(n_layers: int, negative_slope: float, mxu_dtype,
                            d_outs: tuple[int, ...]):
    """Fused input-gradient kernel: recompute the packed forward per tile
    (weights already VMEM-resident), stash only the LeakyReLU derivative
    multiplier per hidden layer (bf16, 1/4 the bytes of the preactivations),
    then run the transposed chain g <- (g * act') @ P^T back to the input.

    One HBM read of x and g, one write of dx — vs the jnp fallback's full
    recompute + per-layer HBM round-trips.  The transposed products use
    dot_general contracting dim 1 with dim 1 (g @ P^T) so the same packed
    weight refs serve both directions.
    """

    def kernel(x_ref, *refs):
        w_refs = refs[:n_layers]
        g_ref = refs[n_layers]
        out_ref = refs[n_layers + 1]
        # forward recompute: keep only the activation-derivative masks
        h = x_ref[:]
        masks = []
        for idx in range(n_layers - 1):
            z = jnp.dot(
                h.astype(mxu_dtype), w_refs[idx][:],
                preferred_element_type=jnp.float32,
            )
            col = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
            neg = (col < d_outs[idx]) & (z < 0)
            masks.append(
                jnp.where(neg, negative_slope, 1.0).astype(jnp.bfloat16)
            )
            h = jnp.where(neg, negative_slope * z, z)
        # transposed chain
        g = g_ref[:]
        for idx in range(n_layers - 1, -1, -1):
            g = jax.lax.dot_general(
                g.astype(mxu_dtype), w_refs[idx][:],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if idx > 0:
                g = g * masks[idx - 1].astype(jnp.float32)
        out_ref[:] = g

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("negative_slope", "interpret", "mxu_dtype", "tile_n"),
)
def _packed_bwd_call(xr, xi, gr, gi, *flat_ws, negative_slope: float = 0.0,
                     interpret: bool = False, mxu_dtype: str = "float32",
                     tile_n: int = 256):
    """Input gradient of `_packed_call` (same packed layout)."""
    n_layers = len(flat_ws) // 2
    n, c_in = xr.shape
    c_out = flat_ws[-2].shape[1]
    md = kernel_mxu_dtype(mxu_dtype)

    x = jnp.concatenate([xr, xi], axis=1)
    g = jnp.concatenate([gr, gi], axis=1)
    n_pad = -n % tile_n
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0)))
        g = jnp.pad(g, ((0, n_pad), (0, 0)))
    n_tot = n + n_pad

    packed_ws, d_outs = [], []
    for k in range(n_layers):
        wr, wi = flat_ws[2 * k], flat_ws[2 * k + 1]
        top = jnp.concatenate([wr, wi], axis=1)
        bot = jnp.concatenate([-wi, wr], axis=1)
        packed_ws.append(jnp.concatenate([top, bot], axis=0).astype(md))
        d_outs.append(wr.shape[1])

    kernel = _make_packed_bwd_kernel(
        n_layers, negative_slope, md, tuple(d_outs)
    )
    x_spec = pl.BlockSpec(
        (tile_n, 2 * c_in), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    g_spec = pl.BlockSpec(
        (tile_n, 2 * c_out), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    w_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in packed_ws
    ]

    flops = 0
    d_in = c_in
    for k in range(n_layers):
        d_out = flat_ws[2 * k].shape[1]
        flops += 2 * n_tot * d_in * d_out * 8  # recompute + transposed chain
        d_in = d_out

    out = pl.pallas_call(
        kernel,
        grid=(n_tot // tile_n,),
        in_specs=[x_spec] + w_specs + [g_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((n_tot, 2 * c_in), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (2 * n_tot * (2 * c_in + c_out))
            + sum(w.dtype.itemsize * w.size for w in packed_ws),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, *packed_ws, g)
    return out[:n, :c_in], out[:n, c_in:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _spectral_mlp_flat(x2, ws, negative_slope: float, interpret: bool,
                       mxu_dtype: str):
    """x2: (N, C, 2) fp32; ws: tuple of (in, out, 2) fp32 weight pairs."""
    flat = []
    for w in ws:
        flat += [w[..., 0], w[..., 1]]
    call = (_karatsuba_call if KARATSUBA
            else _packed_call if PACKED else _fused_call)
    out_r, out_i = call(
        x2[..., 0], x2[..., 1], *flat,
        negative_slope=negative_slope, interpret=interpret,
        mxu_dtype=mxu_dtype,
    )
    return jnp.stack([out_r, out_i], axis=-1)


def _ref_flat(x2, ws, negative_slope):
    pairs = [(w[..., 0], w[..., 1]) for w in ws]
    r, i = _mlp_reference(x2[..., 0], x2[..., 1], pairs, negative_slope)
    return jnp.stack([r, i], axis=-1)


def _fwd(x2, ws, negative_slope, interpret, mxu_dtype):
    return (
        _spectral_mlp_flat(x2, ws, negative_slope, interpret, mxu_dtype),
        (x2, ws),
    )


def _bwd(negative_slope, interpret, mxu_dtype, res, g):
    x2, ws = res
    if PACKED and PALLAS_BWD and kernel_mxu_dtype(mxu_dtype) == jnp.bfloat16:
        # fused Pallas input gradient (bf16 weights fit VMEM alongside the
        # derivative masks; the fp32-weight variant would not)
        flat = []
        for w in ws:
            flat += [w[..., 0], w[..., 1]]
        dxr, dxi = _packed_bwd_call(
            x2[..., 0], x2[..., 1], g[..., 0], g[..., 1], *flat,
            negative_slope=negative_slope, interpret=interpret,
            mxu_dtype=mxu_dtype,
        )
        dx = jnp.stack([dxr, dxi], axis=-1)
        # weight cotangents via the jnp chain; XLA DCEs this whole branch
        # when the surrounding grad never requests them (frozen backbone)
        _, vjp_w = jax.vjp(
            lambda w: _ref_flat(x2, w, negative_slope), ws
        )
        (dws,) = vjp_w(g)
        return dx, dws
    _, vjp = jax.vjp(lambda x, w: _ref_flat(x, w, negative_slope), x2, ws)
    return vjp(g)


_spectral_mlp_flat.defvjp(_fwd, _bwd)


def spectral_mlp(coeffs: jax.Array, weights, negative_slope: float = 0.0,
                 interpret: bool = False,
                 mxu_dtype: str = "float32") -> jax.Array:
    """Fused spectral MLP over complex coefficients.

    coeffs: (..., L, M, C) complex64.
    weights: sequence of (in, out, 2) fp32 real-pair arrays; all but the last
    are followed by ComplexReLU("real").
    Returns (..., L, M, C_out) complex64.
    """
    from msfno_tpu.ops.pallas import resolve_interpret

    interpret = resolve_interpret(interpret)
    shape = coeffs.shape
    c_in = shape[-1]
    x2 = jnp.stack(
        [jnp.real(coeffs), jnp.imag(coeffs)], axis=-1
    ).reshape(-1, c_in, 2).astype(jnp.float32)
    out = _spectral_mlp_flat(
        x2, tuple(weights), negative_slope, interpret, mxu_dtype
    )
    c_out = weights[-1].shape[1]
    out = out.reshape(*shape[:-1], c_out, 2)
    return jax.lax.complex(out[..., 0], out[..., 1])
