"""Fused spectral->output decoder — Pallas TPU kernel.

The SFNO's full-resolution tail is, per step (reference
MSFNO/Models/sfno/sfnonet.py:660-684: last block's inverse SHT -> norm ->
FiLM -> big-skip concat -> decoder MLP):

    inverse-DFT GEMM -> (B, H, W, C) grid field -> instance-norm statistics
    -> normalize + FiLM -> concat(input) -> decoder MLP -> (B, H, W, out)

On TPU every arrow is a full-resolution (721x1440x256) HBM round trip, and
the inverse-DFT GEMM's natural output layout differs from the row-major
layout the grid-MLP custom call pins, so XLA inserts a 531 MB layout copy
(round-5 trace: transpose 1.60 ms + norm statistics passes 1.51 ms +
decoder kernel 2.54 ms = 5.65 ms of a 28.8 ms step).

This kernel fuses the whole tail into ONE pass that never materializes the
grid-space field:

    y[b,h,w,:] = MLP( a[b,:] * (hm[b,h,:,:]^T Mt[w,:]) + b[b,:],
                      skip[b,h,w,:] )

where hm is the Legendre-synthesis intermediate (B, H, 2M, C) — the stacked
[re | im] mode layout of ops/sht.py's merged inverse DFT — Mt = (W, 2M) is
the transposed merged synthesis matrix, and (a, b) is the COMBINED
instance-norm + FiLM per-(batch, channel) affine.  A per-channel affine
commutes with the (linear, channel-preserving) DFT, so `a` is applied to hm
rows before the in-kernel GEMM and `b` added after.

The instance-norm statistics the affine needs are computed OUTSIDE the
kernel, exactly, in spectral space (see `spectral_grid_stats`): by DFT
orthogonality the grid-pixel sums are weighted mode-power sums,

    sum_w x[h,w]   = W * hm[h, m=0_re]
    sum_w x[h,w]^2 = W * sum_m omega_m * hm[h,m]^2,   omega = diag(M M^T)/W

so the statistics cost one read of the (B, H, 2M, C) spectral intermediate
(179 MB fp32) instead of one-plus reads of the 531 MB grid field.

Backward: custom_vjp over the equivalent jnp decomposition (same pattern as
ops/pallas/grid_mlp.py) — FiLM gradients for fine-tuning flow through
(a, b), which are plain jnp functions of the film generator's output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msfno_tpu.ops.pallas import kernel_mxu_dtype
from msfno_tpu.ops.pallas.grid_mlp import _erf_as7126, _gelu_exact

# fused Pallas backward (one pass, no grid-field materialization) vs the
# jnp-reference VJP; module-level so benches can A/B the backward alone
PALLAS_BWD = True

_INV_SQRT_2PI = 0.3989422804014327


def _gelu_grad(z):
    """d/dz [z * Phi(z)] = Phi(z) + z * phi(z), with Phi from the same
    A&S 7.1.26 erf approximation the forward kernel uses."""
    phi = _INV_SQRT_2PI * jnp.exp(-0.5 * z * z)
    cdf = 0.5 * (1.0 + _erf_as7126(z * 0.7071067811865476))
    return cdf + z * phi


def _make_kernel(c_main: int, has_b2: bool, mxu_dtype, out_dtype):
    def kernel(hm_ref, skip_ref, a_ref, b_ref, mt_ref, w1_ref, b1_ref,
               w2_ref, *rest):
        b2_ref = rest[0] if has_b2 else None
        out_ref = rest[-1]

        # (2M, C) spectral rows for this latitude, scaled by the fused
        # norm+film gain in f32 BEFORE the MXU rounding
        t = (hm_ref[0, 0] * a_ref[0]).astype(mxu_dtype)
        # inverse DFT: (W, 2M) @ (2M, C) -> the (W, C) grid row
        x = jnp.dot(mt_ref[:], t, preferred_element_type=jnp.float32)
        x = x + b_ref[0]
        h = jnp.dot(
            x.astype(mxu_dtype), w1_ref[:c_main],
            preferred_element_type=jnp.float32,
        )
        h = h + jnp.dot(
            skip_ref[0, 0].astype(mxu_dtype), w1_ref[c_main:],
            preferred_element_type=jnp.float32,
        )
        h = _gelu_exact(h + b1_ref[:])
        y = jnp.dot(
            h.astype(mxu_dtype), w2_ref[:],
            preferred_element_type=jnp.float32,
        )
        if has_b2:
            y = y + b2_ref[:]
        out_ref[0, 0] = y.astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("has_b2", "mxu_dtype", "interpret", "out_dtype"),
)
def _spectral_decoder_call(hm, skip, a, b, mt, w1, b1, w2, b2, *,
                           has_b2: bool, mxu_dtype: str, interpret: bool,
                           out_dtype: str = "float32"):
    bsz, hrows, two_m, c_main = hm.shape
    w_cols, c_skip = skip.shape[-2], skip.shape[-1]
    hidden = w1.shape[1]
    c_out = w2.shape[1]
    md = kernel_mxu_dtype(mxu_dtype)
    od = jnp.dtype(out_dtype)

    mt_c = mt.astype(md)
    w1_c = w1.astype(md)
    w2_c = w2.astype(md)

    operands = [hm, skip, a, b, mt_c, w1_c, b1.reshape(1, hidden), w2_c]
    in_specs = [
        pl.BlockSpec((1, 1, two_m, c_main), lambda bi, hi: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, w_cols, c_skip), lambda bi, hi: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c_main), lambda bi, hi: (bi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c_main), lambda bi, hi: (bi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(mt_c.shape, lambda bi, hi: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(w1_c.shape, lambda bi, hi: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hidden), lambda bi, hi: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(w2_c.shape, lambda bi, hi: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if has_b2:
        operands.append(b2.reshape(1, c_out))
        in_specs.append(pl.BlockSpec((1, c_out), lambda bi, hi: (0, 0),
                                     memory_space=pltpu.VMEM))

    kernel = _make_kernel(c_main, has_b2, md, od)
    flops = 2 * bsz * hrows * w_cols * (
        two_m * c_main + (c_main + c_skip) * hidden + hidden * c_out
    )
    bytes_accessed = (
        hm.dtype.itemsize * hm.size
        + skip.dtype.itemsize * skip.size
        + od.itemsize * bsz * hrows * w_cols * c_out
        + mt_c.dtype.itemsize * mt_c.size
    )
    out = pl.pallas_call(
        kernel,
        grid=(bsz, hrows),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, w_cols, c_out),
                               lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, hrows, w_cols, c_out), od),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed,
            transcendentals=bsz * hrows * w_cols * hidden,
        ),
        interpret=interpret,
    )(*operands)
    return out


def _make_bwd_kernel(c_main: int, c_skip: int, has_b2: bool, mxu_dtype):
    """One-pass backward for the fused tail: per latitude row, recompute the
    cheap VMEM-resident intermediates (raw DFT row, fc1 pre-activation) and
    emit dhm / dskip plus in-kernel-accumulated da / db / dW1 / db1 / dW2
    [/ db2] — the grid field never touches HBM (round-5 train trace: the
    jnp-reference backward cost ~17 ms/step in full-res recompute chains).
    """

    def kernel(*refs):
        it = iter(refs)
        g_ref = next(it)
        hm_ref = next(it)
        skip_ref = next(it)
        a_ref = next(it)
        b_ref = next(it)
        mt_ref = next(it)
        w1_ref = next(it)
        b1_ref = next(it)
        w2_ref = next(it)
        b2_ref = next(it) if has_b2 else None  # noqa: F841 (shape parity)
        dhm_ref = next(it)
        dskip_ref = next(it)
        da_ref = next(it)
        db_ref = next(it)
        dw1_ref = next(it)
        db1_ref = next(it)
        dw2_ref = next(it)
        db2_ref = next(it) if has_b2 else None
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _zero_per_batch():
            # per-batch affine accumulators (block index follows bi)
            da_ref[...] = jnp.zeros_like(da_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        @pl.when((pl.program_id(0) == 0) & (i == 0))
        def _zero_weight_acc():
            dw1_ref[...] = jnp.zeros_like(dw1_ref)
            db1_ref[...] = jnp.zeros_like(db1_ref)
            dw2_ref[...] = jnp.zeros_like(dw2_ref)
            if has_b2:
                db2_ref[...] = jnp.zeros_like(db2_ref)

        a = a_ref[0]
        # forward recompute (VMEM-only): raw DFT row, affine, fc1 pre-act
        hm_row = hm_ref[0, 0]
        x_raw = jnp.dot(
            mt_ref[:], hm_row.astype(mxu_dtype),
            preferred_element_type=jnp.float32,
        )
        xa = x_raw * a + b_ref[0]
        skip_row = skip_ref[0, 0]
        z1 = (
            jnp.dot(xa.astype(mxu_dtype), w1_ref[:c_main],
                    preferred_element_type=jnp.float32)
            + jnp.dot(skip_row.astype(mxu_dtype), w1_ref[c_main:],
                      preferred_element_type=jnp.float32)
            + b1_ref[:]
        )
        h1 = _gelu_exact(z1)

        g_row = g_ref[0, 0].astype(jnp.float32)
        # transposed chain (dot_general contracting dim 1 with dim 1 uses
        # the same weight refs for both directions)
        dh1 = jax.lax.dot_general(
            g_row.astype(mxu_dtype), w2_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dz1 = dh1 * _gelu_grad(z1)
        dxa = jax.lax.dot_general(
            dz1.astype(mxu_dtype), w1_ref[:c_main],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dskip = jax.lax.dot_general(
            dz1.astype(mxu_dtype), w1_ref[c_main:],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dskip_ref[0, 0] = dskip.astype(dskip_ref.dtype)
        # dhm = a * (mt^T @ dxa)
        dhm = jax.lax.dot_general(
            mt_ref[:], dxa.astype(mxu_dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dhm_ref[0, 0] = dhm * a

        da_ref[...] += jnp.sum(dxa * x_raw, axis=0, keepdims=True)
        db_ref[...] += jnp.sum(dxa, axis=0, keepdims=True)
        dz1m = dz1.astype(mxu_dtype)
        dw1_ref[:c_main] += jax.lax.dot_general(
            xa.astype(mxu_dtype), dz1m, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dw1_ref[c_main:] += jax.lax.dot_general(
            skip_row.astype(mxu_dtype), dz1m, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        db1_ref[...] += jnp.sum(dz1, axis=0, keepdims=True)
        dw2_ref[...] += jax.lax.dot_general(
            h1.astype(mxu_dtype), g_row.astype(mxu_dtype),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if has_b2:
            db2_ref[...] += jnp.sum(g_row, axis=0, keepdims=True)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("has_b2", "mxu_dtype", "interpret"),
)
def _spectral_decoder_bwd_call(g, hm, skip, a, b, mt, w1, b1, w2, b2, *,
                               has_b2: bool, mxu_dtype: str,
                               interpret: bool):
    bsz, hrows, two_m, c_main = hm.shape
    w_cols, c_skip = skip.shape[-2], skip.shape[-1]
    hidden = w1.shape[1]
    c_out = w2.shape[1]
    md = kernel_mxu_dtype(mxu_dtype)

    # (W, 2M) layout serves BOTH directions: the forward-recompute row is a
    # plain dot, and dhm contracts dim 0 with dim 0 via dimension numbers —
    # no materialized transpose either way
    mt_c = jnp.asarray(mt).astype(md)
    w1_c = w1.astype(md)
    w2_c = w2.astype(md)

    row = lambda bi, hi: (bi, hi, 0, 0)
    per_b = lambda bi, hi: (bi, 0)
    glob = lambda bi, hi: (0, 0)
    operands = [g, hm, skip, a.astype(jnp.float32), b.astype(jnp.float32),
                mt_c, w1_c, b1.reshape(1, hidden).astype(jnp.float32), w2_c]
    in_specs = [
        pl.BlockSpec((1, 1, w_cols, c_out), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, two_m, c_main), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, w_cols, c_skip), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c_main), per_b, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c_main), per_b, memory_space=pltpu.VMEM),
        pl.BlockSpec(mt_c.shape, glob, memory_space=pltpu.VMEM),
        pl.BlockSpec(w1_c.shape, glob, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hidden), glob, memory_space=pltpu.VMEM),
        pl.BlockSpec(w2_c.shape, glob, memory_space=pltpu.VMEM),
    ]
    if has_b2:
        operands.append(b2.reshape(1, c_out).astype(jnp.float32))
        in_specs.append(
            pl.BlockSpec((1, c_out), glob, memory_space=pltpu.VMEM)
        )

    out_specs = [
        pl.BlockSpec((1, 1, two_m, c_main), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, w_cols, c_skip), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c_main), per_b, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c_main), per_b, memory_space=pltpu.VMEM),
        pl.BlockSpec((c_main + c_skip, hidden), glob,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hidden), glob, memory_space=pltpu.VMEM),
        pl.BlockSpec((hidden, c_out), glob, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bsz, hrows, two_m, c_main), jnp.float32),
        jax.ShapeDtypeStruct((bsz, hrows, w_cols, c_skip), jnp.float32),
        jax.ShapeDtypeStruct((bsz, c_main), jnp.float32),
        jax.ShapeDtypeStruct((bsz, c_main), jnp.float32),
        jax.ShapeDtypeStruct((c_main + c_skip, hidden), jnp.float32),
        jax.ShapeDtypeStruct((1, hidden), jnp.float32),
        jax.ShapeDtypeStruct((hidden, c_out), jnp.float32),
    ]
    if has_b2:
        out_specs.append(
            pl.BlockSpec((1, c_out), glob, memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((1, c_out), jnp.float32))

    kernel = _make_bwd_kernel(c_main, c_skip, has_b2, md)
    flops = 2 * bsz * hrows * w_cols * (
        2 * two_m * c_main + 3 * (c_main + c_skip) * hidden
        + 2 * hidden * c_out
    )
    return pl.pallas_call(
        kernel,
        grid=(bsz, hrows),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(
                g.dtype.itemsize * g.size
                + 2 * hm.dtype.itemsize * hm.size
                + 2 * skip.dtype.itemsize * skip.size
            ),
            transcendentals=2 * bsz * hrows * w_cols * hidden,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)


def _ref_decoder_f32(ops: dict):
    """jnp reference with the kernel's semantics in fp32: inverse DFT, then
    the fused affine, then the split-kernel big-skip MLP."""
    hm = ops["hm"].astype(jnp.float32)
    x = jnp.einsum("bhmc,wm->bhwc", hm, ops["mt"].astype(jnp.float32))
    x = x * ops["a"][:, None, None, :] + ops["b"][:, None, None, :]
    c_main = hm.shape[-1]
    h = x @ ops["w1"][:c_main]
    h = h + ops["skip"].astype(jnp.float32) @ ops["w1"][c_main:]
    h = jax.nn.gelu(h + ops["b1"], approximate=False)
    y = h @ ops["w2"]
    if "b2" in ops:
        y = y + ops["b2"]
    return y


def _ref_decoder(ops: dict, out_dtype: str = "float32"):
    return _ref_decoder_f32(ops).astype(jnp.dtype(out_dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _spectral_decoder(ops: dict, mxu_dtype: str, interpret: bool,
                      out_dtype: str):
    return _spectral_decoder_call(
        ops["hm"], ops["skip"], ops["a"], ops["b"], ops["mt"], ops["w1"],
        ops["b1"], ops["w2"], ops.get("b2"),
        has_b2="b2" in ops, mxu_dtype=mxu_dtype, interpret=interpret,
        out_dtype=out_dtype,
    )


def _fwd(ops, mxu_dtype, interpret, out_dtype):
    return _spectral_decoder(ops, mxu_dtype, interpret, out_dtype), ops


def _bwd(mxu_dtype, interpret, out_dtype, ops, g):
    if not PALLAS_BWD:
        _, vjp = jax.vjp(
            functools.partial(_ref_decoder, out_dtype=out_dtype), ops
        )
        return vjp(g)
    out = _spectral_decoder_bwd_call(
        g, ops["hm"], ops["skip"], ops["a"], ops["b"], ops["mt"],
        ops["w1"], ops["b1"], ops["w2"], ops.get("b2"),
        has_b2="b2" in ops, mxu_dtype=mxu_dtype, interpret=interpret,
    )
    dhm, dskip, da, db, dw1, db1, dw2 = out[:7]
    ct = {
        "hm": dhm.astype(ops["hm"].dtype),
        "skip": dskip.astype(ops["skip"].dtype),
        "a": da.astype(ops["a"].dtype),
        "b": db.astype(ops["b"].dtype),
        # mt is a baked trig-constant matrix, never a traced function of
        # anything trainable
        "mt": jnp.zeros_like(ops["mt"]),
        "w1": dw1.astype(ops["w1"].dtype),
        "b1": db1.reshape(ops["b1"].shape).astype(ops["b1"].dtype),
        "w2": dw2.astype(ops["w2"].dtype),
    }
    if "b2" in ops:
        ct["b2"] = out[7].reshape(ops["b2"].shape).astype(ops["b2"].dtype)
    return (ct,)


_spectral_decoder.defvjp(_fwd, _bwd)


def spectral_decoder(hm: jax.Array, skip: jax.Array, mt: jax.Array,
                     a: jax.Array, b: jax.Array, w1: jax.Array,
                     b1: jax.Array, w2: jax.Array,
                     b2: jax.Array | None = None,
                     mxu_dtype: str = "bfloat16",
                     interpret: bool = False,
                     out_dtype: jnp.dtype | None = None) -> jax.Array:
    """Fused inverse-DFT + per-channel affine + big-skip decoder MLP.

    hm: (B, H, 2M, C) Legendre-synthesis intermediate (stacked [re | im]
    mode layout, `InverseRealSHT.synthesis_hm`); skip: (B, H, W, S) big-skip
    residual (the raw model input); mt: (W, 2M) transposed merged synthesis
    matrix (`InverseRealSHT.merged_matrix_t`); a, b: (B, C) combined
    norm+FiLM affine applied to the grid field (`a` rides the spectral rows
    through the DFT, `b` is added after — exactly equivalent for a
    channel-wise affine); w1: (C+S, hidden) split-kernel fc1; w2:
    (hidden, out).  Returns (B, H, W, out) in out_dtype (default fp32).
    """
    from msfno_tpu.ops.pallas import resolve_interpret

    interpret = resolve_interpret(interpret)
    ops = {
        "hm": hm,
        "skip": skip,
        "a": a.astype(jnp.float32),
        "b": b.astype(jnp.float32),
        "mt": mt,
        "w1": w1.astype(jnp.float32),
        "b1": b1.astype(jnp.float32),
        "w2": w2.astype(jnp.float32),
    }
    if b2 is not None:
        ops["b2"] = b2.astype(jnp.float32)
    od = str(jnp.dtype(out_dtype or jnp.float32))
    return _spectral_decoder(ops, mxu_dtype, interpret, od)


def spectral_grid_stats(hm: jax.Array, omega) -> tuple[jax.Array, jax.Array]:
    """Exact instance-norm statistics of the (unmaterialized) grid field.

    For x[b,h,w,c] = sum_m hm[b,h,m,c] * M[m,w], longitude-sum identities
    from the orthogonality of the DFT rows (omega = diag(M M^T) / W,
    computed numerically by `InverseRealSHT.mode_power_weights` so any k_m
    convention and zeroed Nyquist/sin rows are automatic):

        mean  E[x]   = mean_h hm[:, :, 0, :]
        power E[x^2] = mean_h sum_m omega_m hm[:, :, m, :]^2

    Returns (mean, mean_sq), each (B, C) fp32 — the same single-pass
    E[x^2]-E[x]^2 contract as InstanceNorm.
    """
    hm32 = hm.astype(jnp.float32)
    mean = jnp.mean(hm32[:, :, 0, :], axis=1)
    om = jnp.asarray(omega, dtype=jnp.float32)
    mean_sq = jnp.einsum(
        "bhmc,m->bc", hm32 * hm32, om,
        precision=jax.lax.Precision.HIGHEST,
    ) / hm.shape[1]
    return mean, mean_sq
