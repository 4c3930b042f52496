"""Fused masked-grid GCN layer — Pallas TPU kernel.

One film-generator GCN layer (models/film/gcn.py, reference
MSFNO/Models/gcn/layers.py:8-48) is

    out = residual + leaky_relu( (box3(x @ W * d) * d + bias) * mask )

where box3 is the 3x3 neighbor sum (periodic longitude, zero past the
poles) and d = D^{-1/2}.  Unfused, each layer is a Dense plus two band
matmuls plus five elementwise stages — at (180, 360, 512) that is ~6
full-field HBM round trips and ~36 GFLOP of MXU time spent multiplying
3-tap band matrices (round-5 trace: ~5.3 ms/step for the 7-layer stack).

This kernel runs the whole layer in ONE pass: the Dense on the MXU, the
3x3 box as VPU shift-adds (2 adds per axis instead of 180x/360x-cost band
GEMMs), and the normalization/bias/mask/activation/residual on the f32
accumulator before a single rounded output write.

Latitude stencil without halo reads: TPU grid steps run sequentially, so
the kernel carries the previous tile's post-Dense rows in VMEM scratch and
emits output tiles with ONE TILE OF LAG — grid step i computes Dense rows
of tile i and writes output tile i-1, whose +-1-row neighborhood is fully
contained in (carry, first row of tile i).  Pole rows use zero neighbors,
matching box3's zero-past-the-poles convention.

Backward: custom_vjp over the jnp decomposition built from the SAME box3
band-matmul reference the unfused model path uses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msfno_tpu.ops.pallas import kernel_mxu_dtype

_TILE_H_CANDIDATES = (12, 10, 9, 8, 6, 5, 4, 3, 2, 1)

# fused Pallas backward (no forward recompute) vs the jnp-reference VJP;
# module-level so benches can A/B the backward alone
PALLAS_BWD = True


def _pick_tile_h(h: int) -> int:
    for t in _TILE_H_CANDIDATES:
        if h % t == 0:
            return t
    return 1


def _make_kernel(c_in: int, has_residual: bool, slope: float, mxu_dtype,
                 out_dtype, tile_h: int):
    def kernel(*refs):
        it = iter(refs)
        x_ref = next(it)
        dinv_in_ref = next(it)
        res_ref = next(it) if has_residual else None
        dinv_out_ref = next(it)
        mask_ref = next(it)
        w_ref = next(it)
        b_ref = next(it)
        out_ref = next(it)
        carry_ref = next(it)

        i = pl.program_id(1)
        n = pl.num_programs(1) - 1

        # Dense + D^{-1/2} scaling for tile i (reads are clamped to tile
        # n-1 at the trailing step; the result is gated off below)
        xt = x_ref[0]  # (tile_h, W, c_in)
        if c_in == 1:
            sup = xt.astype(jnp.float32) * w_ref[0].astype(jnp.float32)
        else:
            wf, cols = xt.shape[1], w_ref.shape[1]
            sup = jnp.dot(
                xt.reshape(tile_h * wf, c_in).astype(mxu_dtype), w_ref[:],
                preferred_element_type=jnp.float32,
            ).reshape(tile_h, wf, cols)
        t_i = sup * dinv_in_ref[0].astype(jnp.float32)

        @pl.when(i > 0)
        def _emit():
            # output tile j = i-1: rows [j*th .. j*th+th); their +-1
            # neighborhood is carry rows [0..th] plus t_i's first row
            # (zero at the south pole, i == n)
            first = t_i[:1] * jnp.where(i < n, 1.0, 0.0)
            below = (
                jnp.concatenate([carry_ref[2:], first], axis=0)
                if tile_h > 1
                else first
            )
            box_h = carry_ref[: tile_h] + carry_ref[1:] + below
            # periodic longitude: 3-tap circulant sum via two rolls
            left = jnp.concatenate([box_h[:, -1:], box_h[:, :-1]], axis=1)
            right = jnp.concatenate([box_h[:, 1:], box_h[:, :1]], axis=1)
            agg = (box_h + left + right) * dinv_out_ref[0].astype(jnp.float32)
            agg = (agg + b_ref[0]) * mask_ref[0].astype(jnp.float32)
            y = jnp.where(agg >= 0.0, agg, slope * agg)
            if has_residual:
                y = y + res_ref[0].astype(jnp.float32)
            out_ref[0] = y.astype(out_dtype)

        # carry for step i+1 covers rows [i*th - 1 .. (i+1)*th): its first
        # row is the old carry's last (i*th - 1), zero at the north pole
        @pl.when(i == 0)
        def _north_pole():
            carry_ref[:1] = jnp.zeros_like(carry_ref[:1])

        @pl.when((i > 0) & (i < n))
        def _shift():
            carry_ref[:1] = carry_ref[tile_h:]

        @pl.when(i < n)
        def _store():
            carry_ref[1:] = t_i

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("has_residual", "slope", "mxu_dtype", "interpret",
                     "out_dtype", "tile_h"),
)
def _gcn_layer_call(x, dinv, mask, w, b, res, *, has_residual: bool,
                    slope: float, mxu_dtype: str, interpret: bool,
                    out_dtype: str, tile_h: int):
    bsz, h, wid, c_in = x.shape
    cols = w.shape[1]
    md = kernel_mxu_dtype(mxu_dtype)
    od = jnp.dtype(out_dtype)
    if h % tile_h:
        raise ValueError(f"tile_h {tile_h} must divide H {h}")
    n_tiles = h // tile_h

    w_c = w.astype(md if c_in > 1 else jnp.float32)
    # index maps are traced: clamp with jnp, not Python min/max
    clamp = lambda bi, i: (bi, jnp.minimum(i, n_tiles - 1), 0, 0)
    lag = lambda bi, i: (bi, jnp.maximum(i - 1, 0), 0, 0)
    operands = [x, dinv]
    in_specs = [
        pl.BlockSpec((1, tile_h, wid, c_in), clamp, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_h, wid, 1), clamp, memory_space=pltpu.VMEM),
    ]
    if has_residual:
        operands.append(res)
        in_specs.append(
            pl.BlockSpec((1, tile_h, wid, cols), lag,
                         memory_space=pltpu.VMEM)
        )
    operands += [dinv, mask, w_c, b.reshape(1, cols)]
    in_specs += [
        pl.BlockSpec((1, tile_h, wid, 1), lag, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_h, wid, 1), lag, memory_space=pltpu.VMEM),
        pl.BlockSpec(w_c.shape, lambda bi, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cols), lambda bi, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]

    kernel = _make_kernel(c_in, has_residual, slope, md, od, tile_h)
    flops = 2 * bsz * h * wid * c_in * cols + 9 * bsz * h * wid * cols
    bytes_accessed = (
        x.dtype.itemsize * x.size * (2 if has_residual else 1)
        + od.itemsize * bsz * h * wid * cols
        + 2 * dinv.dtype.itemsize * dinv.size
        + mask.dtype.itemsize * mask.size
    )
    return pl.pallas_call(
        kernel,
        grid=(bsz, n_tiles + 1),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile_h, wid, cols), lag,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wid, cols), od),
        scratch_shapes=[pltpu.VMEM((tile_h + 1, wid, cols), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        # the f32 stencil temporaries (support, box, shifted copies) exceed
        # Mosaic's default 16 MB scoped-vmem budget at film scale — lift it
        # (v5e VMEM is 128 MB; blocks + temporaries stay well under half)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)


def _make_bwd_kernel(c_in: int, has_residual: bool, slope: float, mxu_dtype,
                     tile_h: int):
    """Input/weight/bias gradients in one stencil pass — NO forward
    recompute.  The activation derivative is recovered from the saved
    output: y = res + leaky(agg) and leaky is sign-preserving, so
    act' = where(y - res >= 0, 1, slope).  box3 is symmetric
    (T_H, T_W are), so the stencil transpose is the same shift-add, run
    with the same sequential-grid row carry as the forward kernel
    (round-5 train trace: the jnp-reference backward cost ~20 ms/step in
    f32 band matmuls, sign masks and layout transposes)."""

    def kernel(*refs):
        it = iter(refs)
        g_ref = next(it)
        y_ref = next(it)
        res_ref = next(it) if has_residual else None
        dinv_in_ref = next(it)
        mask_ref = next(it)
        x_lag_ref = next(it)
        dinv_lag_ref = next(it)
        wt_ref = next(it)
        dx_ref = next(it)
        dw_ref = next(it)
        db_ref = next(it)
        carry_ref = next(it)

        bi = pl.program_id(0)
        i = pl.program_id(1)
        n = pl.num_programs(1) - 1

        @pl.when((bi == 0) & (i == 0))
        def _zero_acc():
            dw_ref[...] = jnp.zeros_like(dw_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        # pointwise cotangent rows for tile i (clamped read at i == n,
        # gated off below): dagg = g * act' * mask; dbx = dagg * dinv
        gt = g_ref[0].astype(jnp.float32)
        yt = y_ref[0].astype(jnp.float32)
        if has_residual:
            yt = yt - res_ref[0].astype(jnp.float32)
        act_p = jnp.where(yt >= 0.0, 1.0, slope)
        dagg = gt * act_p * mask_ref[0].astype(jnp.float32)
        dbx_i = dagg * dinv_in_ref[0].astype(jnp.float32)

        @pl.when(i < n)
        def _accum_db():
            db_ref[...] += jnp.sum(dagg, axis=(0, 1), keepdims=False
                                   ).reshape(db_ref.shape)

        @pl.when(i > 0)
        def _emit():
            first = dbx_i[:1] * jnp.where(i < n, 1.0, 0.0)
            below = (
                jnp.concatenate([carry_ref[2:], first], axis=0)
                if tile_h > 1
                else first
            )
            box_h = carry_ref[: tile_h] + carry_ref[1:] + below
            left = jnp.concatenate([box_h[:, -1:], box_h[:, :-1]], axis=1)
            right = jnp.concatenate([box_h[:, 1:], box_h[:, :1]], axis=1)
            dt = box_h + left + right
            dsup = dt * dinv_lag_ref[0].astype(jnp.float32)
            wf = dsup.shape[0] * dsup.shape[1]
            dsup2 = dsup.reshape(wf, dsup.shape[2])
            dx = jnp.dot(
                dsup2.astype(mxu_dtype), wt_ref[:],
                preferred_element_type=jnp.float32,
            )
            dx_ref[0] = dx.reshape(dx_ref.shape[1:])
            x2 = x_lag_ref[0].reshape(wf, c_in)
            dw_ref[...] += jax.lax.dot_general(
                x2.astype(mxu_dtype), dsup2.astype(mxu_dtype),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(i == 0)
        def _north_pole():
            carry_ref[:1] = jnp.zeros_like(carry_ref[:1])

        @pl.when((i > 0) & (i < n))
        def _shift():
            carry_ref[:1] = carry_ref[tile_h:]

        @pl.when(i < n)
        def _store():
            carry_ref[1:] = dbx_i

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("has_residual", "slope", "mxu_dtype", "interpret",
                     "tile_h"),
)
def _gcn_layer_bwd_call(g, y, res, x, dinv, mask, wt, *, has_residual: bool,
                        slope: float, mxu_dtype: str, interpret: bool,
                        tile_h: int):
    bsz, h, wid, cols = g.shape
    c_in = x.shape[-1]
    md = kernel_mxu_dtype(mxu_dtype)
    if h % tile_h:
        raise ValueError(f"tile_h {tile_h} must divide H {h}")
    n_tiles = h // tile_h

    clamp = lambda bi, i: (bi, jnp.minimum(i, n_tiles - 1), 0, 0)
    lag = lambda bi, i: (bi, jnp.maximum(i - 1, 0), 0, 0)
    acc = lambda bi, i: (0, 0)
    wt_c = wt.astype(md)

    operands = [g, y]
    in_specs = [
        pl.BlockSpec((1, tile_h, wid, cols), clamp, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_h, wid, cols), clamp, memory_space=pltpu.VMEM),
    ]
    if has_residual:
        operands.append(res)
        in_specs.append(
            pl.BlockSpec((1, tile_h, wid, cols), clamp,
                         memory_space=pltpu.VMEM)
        )
    operands += [dinv, mask, x, dinv, wt_c]
    in_specs += [
        pl.BlockSpec((1, tile_h, wid, 1), clamp, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_h, wid, 1), clamp, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_h, wid, c_in), lag, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_h, wid, 1), lag, memory_space=pltpu.VMEM),
        pl.BlockSpec(wt_c.shape, lambda bi, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]

    kernel = _make_bwd_kernel(c_in, has_residual, slope, md, tile_h)
    flops = 2 * bsz * h * wid * cols * (c_in + c_in) + 9 * bsz * h * wid * cols
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_tiles + 1),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, tile_h, wid, c_in), lag,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, cols), acc, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cols), acc, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, h, wid, c_in), jnp.float32),
            jax.ShapeDtypeStruct((c_in, cols), jnp.float32),
            jax.ShapeDtypeStruct((1, cols), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((tile_h + 1, wid, cols), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(
                g.dtype.itemsize * g.size * (3 if has_residual else 2)
                + x.dtype.itemsize * x.size
                + 4 * bsz * h * wid * c_in
            ),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    return out


def _ref_gcn_layer(ops: dict, slope: float = 0.01):
    """jnp reference: the unfused model path's math in fp32 (box3 is the
    same band-matmul reference the standard GraphConvolution uses)."""
    from msfno_tpu.models.film.gcn import box3

    x = ops["x"].astype(jnp.float32)
    w = ops["w"].astype(jnp.float32)
    dinv = ops["dinv"].astype(jnp.float32)
    sup = x * w[0] if x.shape[-1] == 1 and w.shape[0] == 1 else x @ w
    t = sup * dinv
    agg = box3(t) * dinv + ops["b"]
    agg = agg * ops["mask"].astype(jnp.float32)
    y = jnp.where(agg >= 0.0, agg, slope * agg)
    if "res" in ops:
        y = y + ops["res"].astype(jnp.float32)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def _gcn_layer(ops: dict, slope: float, mxu_dtype: str, interpret: bool,
               out_dtype: str, tile_h: int):
    return _gcn_layer_call(
        ops["x"], ops["dinv"], ops["mask"], ops["w"], ops["b"],
        ops.get("res"), has_residual="res" in ops, slope=slope,
        mxu_dtype=mxu_dtype, interpret=interpret, out_dtype=out_dtype,
        tile_h=tile_h,
    )


def _fwd(ops, slope, mxu_dtype, interpret, out_dtype, tile_h):
    y = _gcn_layer(ops, slope, mxu_dtype, interpret, out_dtype, tile_h)
    return y, (ops, y)


def _bwd(slope, mxu_dtype, interpret, out_dtype, tile_h, resids, g):
    ops, y = resids
    if not PALLAS_BWD:
        def f(o):
            return _ref_gcn_layer(o, slope=slope).astype(jnp.dtype(out_dtype))

        _, vjp = jax.vjp(f, ops)
        return vjp(g)
    dx, dw, db = _gcn_layer_bwd_call(
        g, y, ops.get("res"), ops["x"], ops["dinv"], ops["mask"],
        ops["w"].T, has_residual="res" in ops, slope=slope,
        mxu_dtype=mxu_dtype, interpret=interpret, tile_h=tile_h,
    )
    ct = {
        "x": dx.astype(ops["x"].dtype),
        "w": dw.astype(ops["w"].dtype),
        "b": db.reshape(ops["b"].shape).astype(ops["b"].dtype),
        # dinv/mask derive from isnan(sst) comparisons upstream — their
        # true cotangents are annihilated by the zero derivative of the
        # comparison, so zeros here are exact for every real gradient
        "dinv": jnp.zeros_like(ops["dinv"]),
        "mask": jnp.zeros_like(ops["mask"]),
    }
    if "res" in ops:
        ct["res"] = g.astype(ops["res"].dtype)
    return (ct,)


_gcn_layer.defvjp(_fwd, _bwd)


def gcn_layer(x: jax.Array, w: jax.Array, b: jax.Array, dinv: jax.Array,
              mask: jax.Array, residual: jax.Array | None = None,
              slope: float = 0.01, mxu_dtype: str = "bfloat16",
              interpret: bool = False,
              out_dtype: jnp.dtype | None = None) -> jax.Array:
    """One fused GCN layer: residual + leaky_relu((box3(xW*d)*d + b)*mask).

    x: (B, H, W, C_in); w: (C_in, F); b: (F,); dinv/mask: (B, H, W, 1);
    residual: optional (B, H, W, F) added AFTER the activation (the film
    generator's skip).  Returns (B, H, W, F) in out_dtype (default x.dtype).
    """
    from msfno_tpu.ops.pallas import resolve_interpret

    interpret = resolve_interpret(interpret)
    ops = {
        "x": x,
        "w": w.astype(jnp.float32),
        "b": b.astype(jnp.float32),
        "dinv": dinv,
        "mask": mask,
    }
    if residual is not None:
        ops["res"] = residual
    od = str(jnp.dtype(out_dtype or x.dtype))
    tile_h = _pick_tile_h(x.shape[1])
    return _gcn_layer(ops, float(slope), mxu_dtype, interpret, od, tile_h)
