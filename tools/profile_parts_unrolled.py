#!/usr/bin/env python
"""Scan-free (unrolled-chain) variant of profile_parts.py.

Written 2026-08-20 while the axon remote-compile endpoint was dropping
every fresh op-level compile (scan or unrolled, 5 attempts, "Broken
pipe" after 30-50 min); kept so the component budget can be refreshed
with either program shape once the service is healthy.  See BASELINE.md
round-4 fast-tier floor section for the blocked-measurement record.
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
from msfno_tpu.ops.sht import RealSHT, InverseRealSHT

K = 8

def timeit(name, op, x, flops=None, iters=K):
    # unrolled in-program chain (no lax.scan: the axon remote-compile
    # service chokes on fresh SHT-in-scan programs, 2026-08-20): each
    # application is data-dependent on the last via a scalar perturbation
    @jax.jit
    def run(c0):
        c = c0
        for _ in range(iters):
            y = op(jax.tree_util.tree_map(lambda v: v * (1.0 + c * 1e-30), x))
            c = jnp.sum(jnp.abs(y).astype(jnp.float32)) * 1e-30
        return c
    t0 = time.perf_counter()
    float(run(jnp.float32(0.0)))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(jnp.float32(1e-6)))
    dt = (time.perf_counter() - t0) / iters
    extra = f"  {flops/dt/1e12:6.1f} TF/s" if flops else ""
    print(f"{name:26s}: {dt*1e3:7.3f} ms{extra}  (compile {tc:.0f}s)", flush=True)
    return dt

def main():
    B, C = 1, 256
    key = jax.random.PRNGKey(0)
    x_full = jax.jit(lambda k: jax.random.normal(k, (B, 721, 1440, C)))(key)
    x_full_bf = jax.jit(lambda v: v.astype(jnp.bfloat16))(x_full)
    coeffs = jax.jit(lambda k: jax.lax.complex(
        jax.random.normal(k, (B, 120, 121, C)),
        jax.random.normal(jax.random.fold_in(k, 1), (B, 120, 121, C))))(key)
    md = "bfloat16"
    sht_full = RealSHT(721, 1440, lmax=120, mmax=121, grid="equiangular",
                       spectral_rescale=1e5, mxu_dtype=md)
    isht_full = InverseRealSHT(721, 1440, lmax=120, mmax=121,
                               grid="equiangular", spectral_rescale=1e5, mxu_dtype=md)
    f_dft_full = 2 * 721 * 1440 * 121 * C * 2
    f_leg_full = 2 * 121 * 120 * 721 * C * 2
    timeit("sht_full_fwd bf16", sht_full, x_full, flops=f_dft_full + f_leg_full)
    timeit("isht_full    bf16", isht_full, coeffs, flops=f_dft_full + f_leg_full)

    from msfno_tpu.models.sfno.layers import Mlp, BigSkipMlp, InstanceNorm
    x73 = jax.jit(lambda k: jax.random.normal(k, (B, 721, 1440, 73)))(key)
    enc = Mlp(hidden_features=C, out_features=C, output_bias=False, dtype=jnp.bfloat16)
    pe = jax.jit(enc.init)(jax.random.PRNGKey(0), x73)
    f_enc = 721 * 1440 * (73 * C + C * C) * 2
    timeit("encoder_bf16", lambda v: enc.apply(pe, v), x73, flops=f_enc)
    dec = BigSkipMlp(hidden_features=C, out_features=73, in_main=C,
                     skip_features=73, dtype=jnp.bfloat16)
    pd = jax.jit(dec.init)(jax.random.PRNGKey(0), x_full, x73)
    f_dec = 721 * 1440 * ((C + 73) * C + C * 73) * 2
    timeit("decoder_bigskip_bf16", lambda t: dec.apply(pd, t[0], t[1]),
           (x_full, x73), flops=f_dec)
    pe_f32 = jax.jit(lambda k: jax.random.normal(k, (721, 1440, C)))(key)
    timeit("posembed_add fp32param", lambda v: v + pe_f32.astype(v.dtype), x_full_bf)

    from msfno_tpu.models.film.wrapper import FilmWrapper
    from msfno_tpu.utils.config import FilmConfig
    from msfno_tpu.data.synthetic import synthetic_land_mask
    fcfg = FilmConfig(film_gen_type="gcn_custom", compute_dtype="float32")
    fw = FilmWrapper(fcfg)
    hs, ws_ = fcfg.sst_shape
    sst_np = np.random.default_rng(0).standard_normal(
        (B, fcfg.temporal_step, hs, ws_)).astype(np.float32)
    sst_np[..., synthetic_land_mask(hs, ws_)] = np.nan
    sst = jnp.asarray(sst_np)
    pf = jax.jit(fw.init)(jax.random.PRNGKey(0), sst)
    timeit("film_gcn_fp32", lambda v: fw.apply(pf, v), sst)

main()
