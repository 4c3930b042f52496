"""Fused full-resolution grid MLP — Pallas TPU kernel.

The SFNO encoder and decoder are two-matmul MLPs applied pointwise over the
721x1440 grid (reference sfnonet.py:510-520, 630-640; here Mlp/BigSkipMlp in
models/sfno/layers.py).  XLA cannot fuse across two matmuls, so the hidden
activation (721*1440 x 256 fp32 ~= 1.06 GB) makes a full HBM round trip per
MLP, and these stages are bandwidth- not FLOP-bound (BASELINE.md component
budget: "remainder = full-res encoder/decoder/norm memory traffic").

This kernel tiles the flattened pixel axis and keeps both weight matrices
VMEM-resident (73x256 + 256x256 fp32 < 0.5 MB), computing

    y = gelu(x @ W1a [+ skip @ W1b] + b1) @ W2 [+ b2] [+ pe]

per tile: one HBM read of x (and skip/pe), one write of y.  The optional
terms cover the three call sites:

- encoder: x (N, 73) -> 256 -> 256, no output bias, fused positional-embed
  add (the pos_embed read is unavoidable; fusing it here avoids an extra
  full-res y round trip that a separate add would cost);
- decoder: x (N, 256) + big-skip residual (N, 73) -> 256 -> 73 — the skip
  contribution is a second dot against the lower rows of the fc1 kernel
  (same split-kernel layout as layers._SplitDense, checkpoint-identical);
- inner-block MLPs: x (N, 256) -> 512 -> 256 on the 120x240 grid.

The positional embed is (H*W, C_out) shared across batch; its block index is
`i % (H*W // tile)`, which is exact when the tile divides H*W — the caller
picks such a tile (1440 divides both 721*1440 and 120*240) and falls back to
an unfused pe add otherwise.

Backward: custom_vjp over an equivalent jnp reference (two dense matmuls XLA
already schedules well); weight cotangents are DCE'd when the backbone is
frozen (film fine-tuning).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msfno_tpu.ops.pallas import kernel_mxu_dtype

# tile candidates for the flattened pixel axis, largest first; all multiples
# of 8 (fp32 sublane) — the caller picks the first that divides H*W when the
# pos-embed is fused, else the first that keeps padding small
_TILE_CANDIDATES = (1440, 1200, 960, 720, 512, 480, 384, 256, 240, 128, 64,
                    32, 16, 8)


def _pick_tile(n: int, must_divide: bool) -> int:
    for t in _TILE_CANDIDATES:
        if n % t == 0:
            return t
    if must_divide:
        return 0  # no aligned tile: caller must unfuse the pe add
    return 512


# Mosaic has no lowering for lax.erf/erfc (NotImplementedError on TPU,
# observed jax 0.9 2026-08-19), so jax.nn.gelu(approximate=False) cannot be
# used inside the kernel.  Exact gelu is recovered from the Abramowitz &
# Stegun 7.1.26 rational erf approximation (max abs error 1.5e-7 — below
# fp32 resolution for gelu's x*Phi(x) output range; only exp is needed,
# which Mosaic lowers).  The custom VJP's jnp backward (_ref_mlp) keeps the
# true erf gelu: a <=1.5e-7 fwd/bwd activation mismatch is orders below the
# bf16 MXU rounding both paths already carry.
_ERF_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
_ERF_P = 0.3275911


def _erf_as7126(z):
    a = jnp.abs(z)
    t = 1.0 / (1.0 + _ERF_P * a)
    poly = t * (_ERF_A[0] + t * (_ERF_A[1] + t * (
        _ERF_A[2] + t * (_ERF_A[3] + t * _ERF_A[4]))))
    return jnp.sign(z) * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf_as7126(x * 0.7071067811865476))


def _make_kernel(c_main: int, has_skip: bool, has_b2: bool, has_pe: bool,
                 mxu_dtype):
    def kernel(*refs):
        it = iter(refs)
        x_ref = next(it)
        s_ref = next(it) if has_skip else None
        w1_ref = next(it)
        b1_ref = next(it)
        w2_ref = next(it)
        b2_ref = next(it) if has_b2 else None
        pe_ref = next(it) if has_pe else None
        out_ref = next(it)

        h = jnp.dot(
            x_ref[:].astype(mxu_dtype), w1_ref[:c_main],
            preferred_element_type=jnp.float32,
        )
        if has_skip:
            h = h + jnp.dot(
                s_ref[:].astype(mxu_dtype), w1_ref[c_main:],
                preferred_element_type=jnp.float32,
            )
        h = h + b1_ref[:]
        h = _gelu_exact(h)
        y = jnp.dot(
            h.astype(mxu_dtype), w2_ref[:],
            preferred_element_type=jnp.float32,
        )
        if has_b2:
            y = y + b2_ref[:]
        if has_pe:
            y = y + pe_ref[:]
        out_ref[:] = y

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("has_skip", "has_b2", "has_pe", "pe_rows", "mxu_dtype",
                     "interpret", "tile_n"),
)
def _grid_mlp_call(x, skip, w1, b1, w2, b2, pe, *, has_skip: bool,
                   has_b2: bool, has_pe: bool, pe_rows: int, mxu_dtype: str,
                   interpret: bool, tile_n: int):
    n, c_main = x.shape
    hidden = w1.shape[1]
    c_out = w2.shape[1]
    md = kernel_mxu_dtype(mxu_dtype)

    n_pad = -n % tile_n
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0)))
        if has_skip:
            skip = jnp.pad(skip, ((0, n_pad), (0, 0)))
    n_tot = n + n_pad

    operands = [x]
    in_specs = [pl.BlockSpec((tile_n, c_main), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    if has_skip:
        c_skip = skip.shape[1]
        operands.append(skip)
        in_specs.append(pl.BlockSpec((tile_n, c_skip), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
    w1c = w1.astype(md)
    w2c = w2.astype(md)
    operands += [w1c, b1.reshape(1, hidden), w2c]
    in_specs += [
        pl.BlockSpec(w1c.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(w2c.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if has_b2:
        operands.append(b2.reshape(1, c_out))
        in_specs.append(pl.BlockSpec((1, c_out), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    if has_pe:
        pe_tiles = pe_rows // tile_n
        operands.append(pe)
        in_specs.append(pl.BlockSpec((tile_n, c_out),
                                     lambda i: (i % pe_tiles, 0),
                                     memory_space=pltpu.VMEM))

    kernel = _make_kernel(c_main, has_skip, has_b2, has_pe, md)
    c_in_total = c_main + (skip.shape[1] if has_skip else 0)
    flops = 2 * n_tot * (c_in_total * hidden + hidden * c_out)
    bytes_accessed = 4 * n_tot * (c_in_total + c_out) + sum(
        o.dtype.itemsize * o.size for o in operands[1 if not has_skip else 2:]
    )

    out = pl.pallas_call(
        kernel,
        grid=(n_tot // tile_n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_n, c_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tot, c_out), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed,
            transcendentals=n_tot * hidden,
        ),
        interpret=interpret,
    )(*operands)
    return out[:n]


def _ref_mlp(ops: dict):
    """jnp reference with identical semantics (fp32 math)."""
    x = ops["x"].astype(jnp.float32)
    h = x @ ops["w1"][: x.shape[-1]]
    if "skip" in ops:
        h = h + ops["skip"].astype(jnp.float32) @ ops["w1"][x.shape[-1]:]
    h = jax.nn.gelu(h + ops["b1"], approximate=False)
    y = h @ ops["w2"]
    if "b2" in ops:
        y = y + ops["b2"]
    if "pe" in ops:
        n = x.shape[0]
        reps = n // ops["pe"].shape[0]
        y = y + jnp.tile(ops["pe"], (reps, 1))
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _grid_mlp(ops: dict, mxu_dtype: str, interpret: bool, tile_n: int):
    return _grid_mlp_call(
        ops["x"], ops.get("skip"), ops["w1"], ops["b1"], ops["w2"],
        ops.get("b2"), ops.get("pe"),
        has_skip="skip" in ops, has_b2="b2" in ops, has_pe="pe" in ops,
        pe_rows=ops["pe"].shape[0] if "pe" in ops else 0,
        mxu_dtype=mxu_dtype, interpret=interpret, tile_n=tile_n,
    )


def _fwd(ops, mxu_dtype, interpret, tile_n):
    return _grid_mlp(ops, mxu_dtype, interpret, tile_n), ops


def _bwd(mxu_dtype, interpret, tile_n, ops, g):
    _, vjp = jax.vjp(_ref_mlp, ops)
    return vjp(g)


_grid_mlp.defvjp(_fwd, _bwd)


def grid_mlp(x: jax.Array, w1: jax.Array, b1: jax.Array, w2: jax.Array,
             b2: jax.Array | None = None, skip: jax.Array | None = None,
             pe: jax.Array | None = None, mxu_dtype: str = "bfloat16",
             interpret: bool = False) -> jax.Array:
    """Fused pointwise two-layer MLP over grid pixels.

    x: (..., C_main); skip: optional (..., C_skip) concatenated input (the
    fc1 kernel w1 is (C_main + C_skip, hidden), split-dense layout);
    pe: optional (H, W, C_out) or (H*W, C_out) additive term broadcast over
    leading batch dims (requires x's pixel count to be a multiple of H*W).
    Returns fp32 (..., C_out).
    """
    from msfno_tpu.ops.pallas import resolve_interpret

    interpret = resolve_interpret(interpret)
    lead = x.shape[:-1]
    n = 1
    for d in lead:
        n *= d
    # x/skip keep their storage dtype (a host cast would cost a full-res
    # HBM round trip); the kernel casts per-tile at the MXU
    ops = {
        "x": x.reshape(n, x.shape[-1]),
        "w1": w1.astype(jnp.float32),
        "b1": b1.astype(jnp.float32),
        "w2": w2.astype(jnp.float32),
    }
    if b2 is not None:
        ops["b2"] = b2.astype(jnp.float32)
    if skip is not None:
        ops["skip"] = skip.reshape(n, skip.shape[-1])

    pe_flat = None
    if pe is not None:
        pe_flat = pe.reshape(-1, pe.shape[-1]).astype(jnp.float32)
        if n % pe_flat.shape[0] != 0:
            raise ValueError(
                f"pixel count {n} not a multiple of pe rows {pe_flat.shape[0]}"
            )

    tile = _pick_tile(pe_flat.shape[0], True) if pe_flat is not None else 0
    if pe_flat is not None and tile:
        ops["pe"] = pe_flat
    else:
        tile = _pick_tile(n, False)

    out = _grid_mlp(ops, mxu_dtype, interpret, tile)
    if pe_flat is not None and "pe" not in ops:
        # no aligned tile for this grid: unfused add (correctness fallback)
        reps = n // pe_flat.shape[0]
        out = out + jnp.tile(pe_flat, (reps, 1))
    c_out = w2.shape[1]
    return out.reshape(*lead, c_out)
