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
from msfno_tpu.ops.pallas.grid_mlp import _gelu_exact


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
    _, vjp = jax.vjp(
        functools.partial(_ref_decoder, out_dtype=out_dtype), ops
    )
    return vjp(g)


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
