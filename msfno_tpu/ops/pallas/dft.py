"""Truncated longitude-DFT Pallas kernels.

The SHT's longitude stage is a truncated DFT (ops/sht.py): with channels-last
activations (..., H, W, C) the contraction runs over the middle axis W, and
XLA materializes HBM-level layout transposes of the ~1 GB full-resolution
activation around the matmul.  These kernels stream (H-tile, W, C) blocks
through VMEM, contract over W on the MXU, and emit (H-tile, M, C) directly —
one HBM read of x, one write of the (much smaller) truncated spectrum, all
data rearrangement VMEM-local.

analysis:  fr + i*fi,  fr = x @ C,  fi = -(x @ S)     (C, S: (W, M))
synthesis: x = re @ Ci - im @ Si                      (Ci, Si: (M, W))
matching ops/sht.py's _dft_analysis/_dft_synthesis matrices exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msfno_tpu.ops.pallas import kernel_mxu_dtype, resolve_interpret

H_TILE = 4  # small blocks: VMEM budget incl. bf16 cast scratch
C_TILE = 128  # channel tiling keeps blocks inside the ~16 MB VMEM budget
H_TILE_SYNTH = 4  # synthesis emits W-wide blocks -> smaller H tile


def _analysis_kernel(mxu_dtype):
    def kernel(x_ref, c_ref, s_ref, re_ref, im_ref):
        x = x_ref[:].astype(mxu_dtype)  # (HT, W, C)
        cm = c_ref[:].astype(mxu_dtype)  # (W, M)
        sm = s_ref[:].astype(mxu_dtype)
        dims = (((1,), (0,)), ((), ()))
        re = jax.lax.dot_general(x, cm, dims, preferred_element_type=jnp.float32)
        im = -jax.lax.dot_general(x, sm, dims, preferred_element_type=jnp.float32)
        # (HT, C, M) -> (HT, M, C); transpose stays in VMEM
        re_ref[:] = jnp.transpose(re, (0, 2, 1))
        im_ref[:] = jnp.transpose(im, (0, 2, 1))

    return kernel


def _synthesis_kernel(mxu_dtype):
    def kernel(re_ref, im_ref, ci_ref, si_ref, out_ref):
        re = re_ref[:].astype(mxu_dtype)  # (HT, M, C)
        im = im_ref[:].astype(mxu_dtype)
        ci = ci_ref[:].astype(mxu_dtype)  # (M, W)
        si = si_ref[:].astype(mxu_dtype)
        dims = (((1,), (0,)), ((), ()))
        out = jax.lax.dot_general(
            re, ci, dims, preferred_element_type=jnp.float32
        ) - jax.lax.dot_general(im, si, dims, preferred_element_type=jnp.float32)
        # (HT, C, W) -> (HT, W, C)
        out_ref[:] = jnp.transpose(out, (0, 2, 1))

    return kernel


@functools.partial(jax.jit, static_argnames=("mxu_dtype", "interpret"))
def dft_analysis(
    x: jax.Array,
    cmat: jax.Array,
    smat: jax.Array,
    mxu_dtype: str = "float32",
    interpret: bool = False,
):
    """x: (..., H, W, C) fp32; cmat/smat: (W, M).  Returns (fr, fi) each
    (..., H, M, C) fp32."""
    interpret = resolve_interpret(interpret)
    lead = x.shape[:-3]
    h, w, c = x.shape[-3:]
    xf = x.reshape(-1, w, c)
    n = xf.shape[0]
    pad = -n % H_TILE
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0), (0, 0)))
    nt = xf.shape[0]
    m = cmat.shape[1]

    ct = min(C_TILE, c)
    if c % ct:
        raise ValueError(f"channels {c} must divide by {ct}")
    grid = (nt // H_TILE, c // ct)
    x_spec = pl.BlockSpec((H_TILE, w, ct), lambda i, j: (i, 0, j),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((w, m), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((H_TILE, m, ct), lambda i, j: (i, 0, j),
                          memory_space=pltpu.VMEM)
    fr, fi = pl.pallas_call(
        _analysis_kernel(kernel_mxu_dtype(mxu_dtype)),
        grid=grid,
        in_specs=[x_spec, w_spec, w_spec],
        out_specs=(o_spec, o_spec),
        out_shape=(
            jax.ShapeDtypeStruct((nt, m, c), jnp.float32),
            jax.ShapeDtypeStruct((nt, m, c), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * nt * w * m * c,
            bytes_accessed=4 * (nt * w * c + 2 * nt * m * c) + 8 * w * m,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf, cmat, smat)
    if pad:
        fr, fi = fr[:n], fi[:n]
    return fr.reshape(*lead, h, m, c), fi.reshape(*lead, h, m, c)


@functools.partial(jax.jit, static_argnames=("mxu_dtype", "interpret"))
def dft_synthesis(
    re: jax.Array,
    im: jax.Array,
    ci: jax.Array,
    si: jax.Array,
    mxu_dtype: str = "float32",
    interpret: bool = False,
):
    """re/im: (..., H, M, C) fp32; ci/si: (M, W).  Returns (..., H, W, C)."""
    interpret = resolve_interpret(interpret)
    lead = re.shape[:-3]
    h, m, c = re.shape[-3:]
    w = ci.shape[1]
    rf = re.reshape(-1, m, c)
    imf = im.reshape(-1, m, c)
    n = rf.shape[0]
    ht = H_TILE_SYNTH
    pad = -n % ht
    if pad:
        rf = jnp.pad(rf, ((0, pad), (0, 0), (0, 0)))
        imf = jnp.pad(imf, ((0, pad), (0, 0), (0, 0)))
    nt = rf.shape[0]

    ct = min(C_TILE, c)
    if c % ct:
        raise ValueError(f"channels {c} must divide by {ct}")
    grid = (nt // ht, c // ct)
    i_spec = pl.BlockSpec((ht, m, ct), lambda i, j: (i, 0, j),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((m, w), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((ht, w, ct), lambda i, j: (i, 0, j),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _synthesis_kernel(kernel_mxu_dtype(mxu_dtype)),
        grid=grid,
        in_specs=[i_spec, i_spec, w_spec, w_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((nt, w, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * nt * w * m * c,
            bytes_accessed=4 * (nt * w * c + 2 * nt * m * c) + 8 * w * m,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rf, imf, ci, si)
    if pad:
        out = out[:n]
    return out.reshape(*lead, h, w, c)
