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
# pos-embed is fused, else the first that keeps padding small.  The 5760/
# 2880 tiles amortize per-grid-step overhead on the big grids (the round-5
# trace showed the 120x240 inner MLPs at ~2.7x their traffic floor); VMEM
# at 5760 rows stays < 25 MB across all three call-site shapes.
_TILE_CANDIDATES = (5760, 2880, 1440, 1200, 960, 720, 512, 480, 384, 256,
                    240, 128, 64, 32, 16, 8)


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
                 mxu_dtype, out_dtype, tiles_per_sample: int = 0,
                 has_affine: bool = False, has_res: bool = False):
    def kernel(*refs):
        it = iter(refs)
        x_ref = next(it)
        s_ref = next(it) if has_skip else None
        aa_ref = next(it) if has_affine else None
        ab_ref = next(it) if has_affine else None
        w1_ref = next(it)
        b1_ref = next(it)
        w2_ref = next(it)
        b2_ref = next(it) if has_b2 else None
        pe_ref = next(it) if has_pe else None
        r_ref = next(it) if has_res else None
        out_ref = next(it)
        ssum_ref = next(it) if tiles_per_sample else None
        ssq_ref = next(it) if tiles_per_sample else None

        if has_affine:
            # per-sample channel affine (folded norm1 + FiLM): applied in
            # f32 registers, rounded to the MXU dtype at the dot — replaces
            # the unfused path's normalize write + MLP re-read of the
            # 120x240x256 activation (round-5 trace: inner-block glue
            # 2.4 ms/step across 489 small fusions)
            xin = (x_ref[:].astype(jnp.float32) * aa_ref[:]
                   + ab_ref[:]).astype(mxu_dtype)
        else:
            xin = x_ref[:].astype(mxu_dtype)
        h = jnp.dot(
            xin, w1_ref[:c_main],
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
            # pe arrives in its storage dtype (bf16 on the fast tier —
            # halves the 1 GB full-res positional-embed read); the add
            # happens in f32 registers either way
            y = y + pe_ref[:].astype(jnp.float32)
        if has_res:
            # fused outer-identity skip: the separate residual-add fusion's
            # read+write of the block activation disappears
            y = y + r_ref[:].astype(jnp.float32)
        # bf16 out_dtype rounds at the WRITE instead of in a downstream
        # convert fusion: same values, half the write traffic, and no
        # 1 GB fp32 intermediate for the consumer to re-read (round-5
        # trace: the encoder's f32 output cost ~1.3 ms of pure traffic)
        out_ref[:] = y.astype(out_dtype)
        if tiles_per_sample:
            # per-sample instance-norm statistics ride the output write:
            # the downstream norm never re-reads the full-res activation
            # (round-5 trace: the separate stats+convert fusion cost
            # 2.3 ms/step at 721x1440x256).  Sums accumulate in f32 over
            # the f32 pre-rounding y — identical to the unfused path,
            # which also computed stats from the kernel's f32 output.
            # TPU grid steps run sequentially and i//tps is non-decreasing,
            # so the (1, C) accumulator block stays VMEM-resident per
            # sample (standard revisit pattern).
            i = pl.program_id(0)

            @pl.when(i % tiles_per_sample == 0)
            def _init():
                ssum_ref[:] = jnp.zeros_like(ssum_ref)
                ssq_ref[:] = jnp.zeros_like(ssq_ref)

            ssum_ref[:] += jnp.sum(y, axis=0, keepdims=True)
            ssq_ref[:] += jnp.sum(y * y, axis=0, keepdims=True)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("has_skip", "has_b2", "has_pe", "pe_rows", "mxu_dtype",
                     "interpret", "tile_n", "out_dtype", "stats_rows",
                     "aff_rows", "has_res"),
)
def _grid_mlp_call(x, skip, w1, b1, w2, b2, pe, aff_a=None, aff_b=None,
                   res=None, *, has_skip: bool,
                   has_b2: bool, has_pe: bool, pe_rows: int, mxu_dtype: str,
                   interpret: bool, tile_n: int, out_dtype: str = "float32",
                   stats_rows: int = 0, aff_rows: int = 0,
                   has_res: bool = False):
    n, c_main = x.shape
    hidden = w1.shape[1]
    c_out = w2.shape[1]
    md = kernel_mxu_dtype(mxu_dtype)
    od = jnp.dtype(out_dtype)
    if stats_rows and (n % stats_rows or stats_rows % tile_n):
        raise ValueError(
            f"stats_rows {stats_rows} must divide n {n} and be a multiple "
            f"of tile {tile_n}"
        )
    if aff_rows and (n % aff_rows or aff_rows % tile_n):
        raise ValueError(
            f"aff_rows {aff_rows} must divide n {n} and be a multiple "
            f"of tile {tile_n}"
        )

    n_pad = -n % tile_n
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0)))
        if has_skip:
            skip = jnp.pad(skip, ((0, n_pad), (0, 0)))
        if has_res:
            res = jnp.pad(res, ((0, n_pad), (0, 0)))
    n_tot = n + n_pad

    operands = [x]
    in_specs = [pl.BlockSpec((tile_n, c_main), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    if has_skip:
        c_skip = skip.shape[1]
        operands.append(skip)
        in_specs.append(pl.BlockSpec((tile_n, c_skip), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
    if aff_rows:
        aff_tps = aff_rows // tile_n
        operands += [aff_a.astype(jnp.float32), aff_b.astype(jnp.float32)]
        in_specs += [
            pl.BlockSpec((1, c_main), lambda i, t=aff_tps: (i // t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_main), lambda i, t=aff_tps: (i // t, 0),
                         memory_space=pltpu.VMEM),
        ]
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
    if has_res:
        operands.append(res)
        in_specs.append(pl.BlockSpec((tile_n, c_out), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))

    tps = stats_rows // tile_n if stats_rows else 0
    kernel = _make_kernel(c_main, has_skip, has_b2, has_pe, md, od,
                          tiles_per_sample=tps, has_affine=bool(aff_rows),
                          has_res=has_res)
    c_in_total = c_main + (skip.shape[1] if has_skip else 0)
    flops = 2 * n_tot * (c_in_total * hidden + hidden * c_out)
    bytes_accessed = (
        x.dtype.itemsize * n_tot * c_in_total
        + od.itemsize * n_tot * c_out
        + sum(
            o.dtype.itemsize * o.size
            for o in operands[1 if not has_skip else 2:]
        )
    )

    out_specs = pl.BlockSpec((tile_n, c_out), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n_tot, c_out), od)
    if tps:
        n_samples = n // stats_rows
        out_specs = [
            out_specs,
            pl.BlockSpec((1, c_out), lambda i: (i // tps, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i: (i // tps, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((n_samples, c_out), jnp.float32),
            jax.ShapeDtypeStruct((n_samples, c_out), jnp.float32),
        ]

    out = pl.pallas_call(
        kernel,
        grid=(n_tot // tile_n,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed,
            transcendentals=n_tot * hidden,
        ),
        # the f32 hidden-layer temporaries at the 5760/2880-row tiles exceed
        # Mosaic's default 16 MB scoped-vmem budget; lift it (see gcn_layer)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    if tps:
        y, ssum, ssq = out
        return y[:n], ssum, ssq
    return out[:n]


def _ref_mlp_f32(ops: dict):
    """jnp reference with identical semantics (fp32 math, pre-rounding)."""
    x = ops["x"].astype(jnp.float32)
    if "aff_a" in ops:
        ns = ops["aff_a"].shape[0]
        xr = x.reshape(ns, -1, x.shape[-1])
        x = (
            xr * ops["aff_a"].astype(jnp.float32)[:, None]
            + ops["aff_b"].astype(jnp.float32)[:, None]
        ).reshape(x.shape)
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
        y = y + jnp.tile(ops["pe"].astype(jnp.float32), (reps, 1))
    if "res" in ops:
        y = y + ops["res"].astype(jnp.float32)
    return y


def _ref_mlp(ops: dict, out_dtype: str = "float32"):
    return _ref_mlp_f32(ops).astype(jnp.dtype(out_dtype))


def _ref_mlp_stats(ops: dict, out_dtype: str, stats_rows: int):
    y = _ref_mlp_f32(ops)
    c = y.shape[-1]
    ys = y.reshape(-1, stats_rows, c)
    return (
        y.astype(jnp.dtype(out_dtype)),
        jnp.sum(ys, axis=1),
        jnp.sum(ys * ys, axis=1),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def _grid_mlp(ops: dict, mxu_dtype: str, interpret: bool, tile_n: int,
              out_dtype: str, aff_rows: int = 0):
    return _grid_mlp_call(
        ops["x"], ops.get("skip"), ops["w1"], ops["b1"], ops["w2"],
        ops.get("b2"), ops.get("pe"), ops.get("aff_a"), ops.get("aff_b"),
        ops.get("res"),
        has_skip="skip" in ops, has_b2="b2" in ops, has_pe="pe" in ops,
        pe_rows=ops["pe"].shape[0] if "pe" in ops else 0,
        mxu_dtype=mxu_dtype, interpret=interpret, tile_n=tile_n,
        out_dtype=out_dtype, aff_rows=aff_rows, has_res="res" in ops,
    )


def _fwd(ops, mxu_dtype, interpret, tile_n, out_dtype, aff_rows=0):
    return _grid_mlp(ops, mxu_dtype, interpret, tile_n, out_dtype,
                     aff_rows), ops


def _bwd(mxu_dtype, interpret, tile_n, out_dtype, aff_rows, ops, g):
    _, vjp = jax.vjp(functools.partial(_ref_mlp, out_dtype=out_dtype), ops)
    return vjp(g)


_grid_mlp.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def _grid_mlp_with_stats(ops: dict, mxu_dtype: str, interpret: bool,
                         tile_n: int, out_dtype: str, stats_rows: int):
    return _grid_mlp_call(
        ops["x"], ops.get("skip"), ops["w1"], ops["b1"], ops["w2"],
        ops.get("b2"), ops.get("pe"),
        has_skip="skip" in ops, has_b2="b2" in ops, has_pe="pe" in ops,
        pe_rows=ops["pe"].shape[0] if "pe" in ops else 0,
        mxu_dtype=mxu_dtype, interpret=interpret, tile_n=tile_n,
        out_dtype=out_dtype, stats_rows=stats_rows,
    )


def _fwd_stats(ops, mxu_dtype, interpret, tile_n, out_dtype, stats_rows):
    return (
        _grid_mlp_with_stats(ops, mxu_dtype, interpret, tile_n, out_dtype,
                             stats_rows),
        ops,
    )


def _bwd_stats(mxu_dtype, interpret, tile_n, out_dtype, stats_rows, ops, g):
    _, vjp = jax.vjp(
        functools.partial(_ref_mlp_stats, out_dtype=out_dtype,
                          stats_rows=stats_rows),
        ops,
    )
    return vjp(g)


_grid_mlp_with_stats.defvjp(_fwd_stats, _bwd_stats)


def _make_enc_kernel(mxu_dtype, out_dtype, has_pe: bool):
    def kernel(*refs):
        it = iter(refs)
        x_ref = next(it)
        w1_ref = next(it)
        b1_ref = next(it)
        w2_ref = next(it)
        pe_ref = next(it) if has_pe else None
        cs_ref = next(it)
        f_ref = next(it)
        ssum_ref = next(it)
        ssq_ref = next(it)
        hi = pl.program_id(1)

        @pl.when(hi == 0)
        def _init():
            ssum_ref[:] = jnp.zeros_like(ssum_ref)
            ssq_ref[:] = jnp.zeros_like(ssq_ref)

        h = jnp.dot(
            x_ref[0, 0].astype(mxu_dtype), w1_ref[:],
            preferred_element_type=jnp.float32,
        )
        h = _gelu_exact(h + b1_ref[:])
        y = jnp.dot(
            h.astype(mxu_dtype), w2_ref[:],
            preferred_element_type=jnp.float32,
        )
        if has_pe:
            y = y + pe_ref[0].astype(jnp.float32)
        ssum_ref[:] += jnp.sum(y, axis=0, keepdims=True)
        ssq_ref[:] += jnp.sum(y * y, axis=0, keepdims=True)
        # forward truncated DFT of this latitude row: (2M, W) x (W, C) via
        # dimension numbers — the grid-space row never reaches HBM.  The
        # row is rounded to the MXU dtype first, matching the unfused
        # path's stored-bf16 -> DFT-GEMM numerics exactly.
        f_ref[0, 0] = jax.lax.dot_general(
            cs_ref[:], y.astype(mxu_dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("has_pe", "mxu_dtype", "interpret", "out_dtype"),
)
def _grid_encoder_spectral_call(x, w1, b1, w2, pe, cs, *, has_pe: bool,
                                mxu_dtype: str, interpret: bool,
                                out_dtype: str):
    bsz, hrows, wcols, c_in = x.shape
    hidden = w1.shape[1]
    c_out = w2.shape[1]
    two_m = cs.shape[1]
    md = kernel_mxu_dtype(mxu_dtype)
    od = jnp.dtype(out_dtype)
    cs_c = cs.astype(md)

    row = lambda bi, hi: (bi, hi, 0, 0)
    glob = lambda bi, hi: (0, 0)
    per_b = lambda bi, hi: (bi, 0)
    operands = [x, w1.astype(md), b1.reshape(1, hidden), w2.astype(md)]
    in_specs = [
        pl.BlockSpec((1, 1, wcols, c_in), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((c_in, hidden), glob, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hidden), glob, memory_space=pltpu.VMEM),
        pl.BlockSpec((hidden, c_out), glob, memory_space=pltpu.VMEM),
    ]
    if has_pe:
        operands.append(pe)
        in_specs.append(
            pl.BlockSpec((1, wcols, c_out), lambda bi, hi: (hi, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    operands.append(cs_c)
    in_specs.append(
        pl.BlockSpec((wcols, two_m), glob, memory_space=pltpu.VMEM)
    )

    kernel = _make_enc_kernel(md, od, has_pe)
    flops = 2 * bsz * hrows * wcols * (
        c_in * hidden + hidden * c_out + two_m * c_out
    )
    return pl.pallas_call(
        kernel,
        grid=(bsz, hrows),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, two_m, c_out), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), per_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), per_b, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, hrows, two_m, c_out), od),
            jax.ShapeDtypeStruct((bsz, c_out), jnp.float32),
            jax.ShapeDtypeStruct((bsz, c_out), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(
                x.dtype.itemsize * x.size
                + od.itemsize * bsz * hrows * two_m * c_out
                + (pe.dtype.itemsize * pe.size if has_pe else 0)
            ),
            transcendentals=bsz * hrows * wcols * hidden,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)


def _ref_encoder_spectral(ops: dict, mxu_dtype: str, out_dtype: str):
    """jnp reference: encoder MLP (+pe) then the truncated forward DFT with
    the kernel's rounding points (row rounded to mxu dtype before the DFT)."""
    md = kernel_mxu_dtype(mxu_dtype)
    x = ops["x"].astype(jnp.float32)  # (B, H, W, C_in)
    h = jax.nn.gelu(x @ ops["w1"] + ops["b1"], approximate=False)
    y = h @ ops["w2"]
    if "pe" in ops:
        y = y + ops["pe"].astype(jnp.float32)[None]
    ym = y.astype(md).astype(jnp.float32)
    cs = ops["cs"].astype(md).astype(jnp.float32)
    f = jnp.einsum("bhwc,wm->bhmc", ym, cs).astype(jnp.dtype(out_dtype))
    c = y.shape[-1]
    ys = y.reshape(x.shape[0], -1, c)
    return f, jnp.sum(ys, axis=1), jnp.sum(ys * ys, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _grid_encoder_spectral(ops: dict, mxu_dtype: str, interpret: bool,
                           out_dtype: str):
    return _grid_encoder_spectral_call(
        ops["x"], ops["w1"], ops["b1"], ops["w2"], ops.get("pe"), ops["cs"],
        has_pe="pe" in ops, mxu_dtype=mxu_dtype, interpret=interpret,
        out_dtype=out_dtype,
    )


def _enc_fwd(ops, mxu_dtype, interpret, out_dtype):
    return _grid_encoder_spectral(ops, mxu_dtype, interpret, out_dtype), ops


def _enc_bwd(mxu_dtype, interpret, out_dtype, ops, g):
    # reference VJP: in film fine-tuning the encoder sits in the frozen
    # prefix and XLA DCEs this entire backward; full training pays the
    # unfused recompute (documented trade — revisit if full training
    # becomes a hot path)
    _, vjp = jax.vjp(
        lambda o: _ref_encoder_spectral(o, mxu_dtype, out_dtype), ops
    )
    return vjp(g)


_grid_encoder_spectral.defvjp(_enc_fwd, _enc_bwd)


def grid_encoder_spectral(x: jax.Array, w1: jax.Array, b1: jax.Array,
                          w2: jax.Array, pe: jax.Array | None,
                          cs: jax.Array, mxu_dtype: str = "bfloat16",
                          interpret: bool = False,
                          out_dtype: jnp.dtype | None = None):
    """Encoder MLP + pos-embed + instance-norm statistics + forward
    truncated DFT in ONE pass: x (B, H, W, C_in) -> (f, ssum, ssq) with
    f (B, H, 2M, C) the stacked [re | im] longitude modes (ops/sht.py
    merged-analysis layout) — the 721x1440x256 grid-space encoder output
    never touches HBM (round-5 trace: its write + the DFT's re-read cost
    ~1.6 ms/step).  cs: (W, 2M) merged analysis matrix
    (`RealSHT.merged_analysis`)."""
    from msfno_tpu.ops.pallas import resolve_interpret

    interpret = resolve_interpret(interpret)
    ops = {
        "x": x,
        "w1": w1.astype(jnp.float32),
        "b1": b1.astype(jnp.float32),
        "w2": w2.astype(jnp.float32),
        "cs": cs,
    }
    if pe is not None:
        ops["pe"] = pe
    od = str(jnp.dtype(out_dtype or jnp.bfloat16))
    return _grid_encoder_spectral(ops, mxu_dtype, interpret, od)


def grid_mlp(x: jax.Array, w1: jax.Array, b1: jax.Array, w2: jax.Array,
             b2: jax.Array | None = None, skip: jax.Array | None = None,
             pe: jax.Array | None = None, mxu_dtype: str = "bfloat16",
             interpret: bool = False,
             out_dtype: jnp.dtype | None = None,
             stats_rows: int | None = None,
             affine: tuple[jax.Array, jax.Array] | None = None,
             residual: jax.Array | None = None):
    """Fused pointwise two-layer MLP over grid pixels.

    x: (..., C_main); skip: optional (..., C_skip) concatenated input (the
    fc1 kernel w1 is (C_main + C_skip, hidden), split-dense layout);
    pe: optional (H, W, C_out) or (H*W, C_out) additive term broadcast over
    leading batch dims (requires x's pixel count to be a multiple of H*W),
    read in ITS OWN dtype (pass bf16 to halve the full-res read).
    Returns (..., C_out) in `out_dtype` (default fp32): the kernel rounds
    at the output write, so asking for bf16 directly replaces a downstream
    convert of a GB-scale fp32 intermediate with identical values.

    stats_rows: if set (rows per sample, e.g. H*W), ALSO returns per-sample
    instance-norm statistics accumulated in-kernel from the f32
    pre-rounding output — returns (y, ssum, ssq) with ssum/ssq f32
    (n_samples, C_out).  Falls back to (y, None, None) when the tile does
    not divide stats_rows (caller computes stats the plain way).

    affine: optional (A, B) per-sample channel affine — each (n_samples,
    C_main) or broadcastable (n_samples, 1, 1, C_main) — applied to x in
    f32 inside the kernel before fc1 (u = A*x + B).  This is the folded
    norm1 + FiLM of an inner SFNO block: the normalized/modulated field is
    never materialized in HBM.  Mutually exclusive with `pe`/`stats_rows`
    (no call site combines them).

    residual: optional (..., C_out) added to the output inside the kernel
    (the block's outer identity skip).
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
        pe_flat = pe.reshape(-1, pe.shape[-1])
        if n % pe_flat.shape[0] != 0:
            raise ValueError(
                f"pixel count {n} not a multiple of pe rows {pe_flat.shape[0]}"
            )

    aff_rows = 0
    if affine is not None:
        if pe is not None or stats_rows is not None:
            raise ValueError("affine is mutually exclusive with pe/stats")
        aff_a, aff_b = (
            a.reshape(a.shape[0], a.shape[-1]) for a in affine
        )
        if n % aff_a.shape[0] != 0:
            raise ValueError(
                f"pixel count {n} not a multiple of affine samples "
                f"{aff_a.shape[0]}"
            )
        aff_rows = n // aff_a.shape[0]

    if residual is not None:
        ops["res"] = residual.reshape(n, residual.shape[-1])

    if aff_rows:
        tile = _pick_tile(aff_rows, True)
        if tile:
            ops["aff_a"], ops["aff_b"] = aff_a, aff_b
        else:
            # no aligned tile for this grid: apply the affine outside the
            # kernel (correctness fallback — costs the round trip the fused
            # path avoids)
            ns = aff_a.shape[0]
            xr = ops["x"].astype(jnp.float32).reshape(ns, aff_rows, -1)
            ops["x"] = (
                xr * aff_a.astype(jnp.float32)[:, None]
                + aff_b.astype(jnp.float32)[:, None]
            ).reshape(n, -1).astype(ops["x"].dtype)
            aff_rows = 0
            tile = _pick_tile(n, False)
    else:
        tile = _pick_tile(pe_flat.shape[0], True) if pe_flat is not None else 0
        if pe_flat is not None and tile:
            ops["pe"] = pe_flat
        else:
            tile = _pick_tile(n, False)

    od = str(jnp.dtype(out_dtype or jnp.float32))
    c_out = w2.shape[1]
    want_stats = stats_rows is not None
    stats_ok = (
        want_stats
        and n % stats_rows == 0
        and stats_rows % tile == 0
        and ("pe" in ops or pe_flat is None)  # no unfused-pe fallback mixes
    )
    if stats_ok:
        y, ssum, ssq = _grid_mlp_with_stats(
            ops, mxu_dtype, interpret, tile, od, stats_rows
        )
        return y.reshape(*lead, c_out), ssum, ssq
    out = _grid_mlp(ops, mxu_dtype, interpret, tile, od, aff_rows)
    if pe_flat is not None and "pe" not in ops:
        # no aligned tile for this grid: unfused add (correctness fallback)
        reps = n // pe_flat.shape[0]
        out = (out.astype(jnp.float32)
               + jnp.tile(pe_flat.astype(jnp.float32), (reps, 1))
               ).astype(out.dtype)
    out = out.reshape(*lead, c_out)
    if want_stats:
        return out, None, None
    return out
