"""Component-level TPU profile of the flagship MSFNO step.

v2: every part is timed INSIDE one jit program via lax.scan (per-call
dispatch over the axon tunnel is ~1.2 ms, which dominated the v1 numbers for
~1 ms parts).  The scan carry is a scalar that perturbs the input each
iteration (defeats CSE/hoisting) and absorbs a cheap reduction of the output
(keeps the chain data-dependent).
"""

import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import time

import jax, jax.numpy as jnp, numpy as np

from msfno_tpu.ops.sht import RealSHT, InverseRealSHT

K = 20
# Each timeit compiles its own scan program over the tunnel (~40 s apiece,
# dominated by constant upload); a full run takes ~15 min.  Run with
# `python -u ... > file` (no pipes — block buffering hides all progress) and
# do NOT wrap in a short `timeout`: killing mid-TPU-claim wedges the tunnel.


def timeit(name, op, x, flops=None, iters=K):
    """op: pytree -> array.  Times K in-program applications of op on a
    perturbed input; reports the marginal per-application cost."""

    def body(c, _):
        y = op(jax.tree_util.tree_map(lambda v: v * (1.0 + c * 1e-30), x))
        return jnp.sum(jnp.abs(y).astype(jnp.float32)) * 1e-30, None

    @jax.jit
    def run(c0):
        c, _ = jax.lax.scan(body, c0, None, length=iters)
        return c

    c = run(jnp.float32(0.0))
    float(c)
    t0 = time.perf_counter()
    float(run(jnp.float32(1e-6)))
    dt = (time.perf_counter() - t0) / iters
    extra = f"  {flops/dt/1e12:6.1f} TF/s" if flops else ""
    print(f"{name:26s}: {dt*1e3:7.3f} ms{extra}", flush=True)
    return dt


def main():
    B, C = 1, 256
    key = jax.random.PRNGKey(0)
    x_full = jax.jit(lambda k: jax.random.normal(k, (B, 721, 1440, C)))(key)
    x_full_bf = jax.jit(lambda v: v.astype(jnp.bfloat16))(x_full)
    x_dn = jax.jit(lambda k: jax.random.normal(k, (B, 120, 240, C)))(key)
    coeffs = jax.jit(
        lambda k: jax.lax.complex(
            jax.random.normal(k, (B, 120, 121, C)),
            jax.random.normal(jax.random.fold_in(k, 1), (B, 120, 121, C)),
        )
    )(key)

    for md in ("float32", "bfloat16"):
        sht_full = RealSHT(721, 1440, lmax=120, mmax=121, grid="equiangular",
                           spectral_rescale=1e5, mxu_dtype=md)
        isht_full = InverseRealSHT(721, 1440, lmax=120, mmax=121,
                                   grid="equiangular", spectral_rescale=1e5,
                                   mxu_dtype=md)
        sht_dn = RealSHT(120, 240, lmax=120, mmax=121, grid="legendre-gauss",
                         spectral_rescale=1e5, mxu_dtype=md)
        isht_dn = InverseRealSHT(120, 240, lmax=120, mmax=121,
                                 grid="legendre-gauss", spectral_rescale=1e5,
                                 mxu_dtype=md)
        # DFT FLOPs: cos+sin matmuls; Legendre: re+im matmuls
        f_dft_full = 2 * 721 * 1440 * 121 * C * 2
        f_leg_full = 2 * 121 * 120 * 721 * C * 2
        tag = "bf16" if md == "bfloat16" else "f32 "
        timeit(f"sht_full_fwd {tag}", sht_full, x_full,
               flops=f_dft_full + f_leg_full)
        timeit(f"isht_full    {tag}", isht_full, coeffs,
               flops=f_dft_full + f_leg_full)
        f_dft_dn = 2 * 120 * 240 * 121 * C * 2
        f_leg_dn = 2 * 121 * 120 * 120 * C * 2
        timeit(f"sht_down_fwd {tag}", sht_dn, x_dn, flops=f_dft_dn + f_leg_dn)
        timeit(f"isht_down    {tag}", isht_dn, coeffs, flops=f_dft_dn + f_leg_dn)

    # spectral MLP (fused pallas, bf16)
    from msfno_tpu.ops.pallas.spectral_mlp import spectral_mlp
    dims = [C, 512, 512, 512, C]
    ws = []
    for i in range(4):
        key, k = jax.random.split(key)
        ws.append(0.02 * jax.random.normal(k, (dims[i], dims[i + 1], 2)))
    n_modes = 120 * 121
    f_mlp = sum(n_modes * dims[i] * dims[i + 1] * 8 for i in range(4))
    timeit("spectral_mlp pallas bf16", lambda v: spectral_mlp(v, ws, mxu_dtype="bfloat16"),
           coeffs, flops=f_mlp)
    timeit("spectral_mlp pallas f32 ", lambda v: spectral_mlp(v, ws), coeffs,
           flops=f_mlp)

    # encoder / decoder / norm at full res (bf16 compute dtype)
    from msfno_tpu.models.sfno.layers import Mlp, BigSkipMlp, InstanceNorm

    x73 = jax.jit(lambda k: jax.random.normal(k, (B, 721, 1440, 73)))(key)
    enc = Mlp(hidden_features=C, out_features=C, output_bias=False,
              dtype=jnp.bfloat16)
    pe = jax.jit(enc.init)(jax.random.PRNGKey(0), x73)
    f_enc = 721 * 1440 * (73 * C + C * C) * 2
    timeit("encoder_bf16", lambda v: enc.apply(pe, v), x73, flops=f_enc)

    dec = BigSkipMlp(hidden_features=C, out_features=73, in_main=C,
                     skip_features=73, dtype=jnp.bfloat16)
    pd = jax.jit(dec.init)(jax.random.PRNGKey(0), x_full, x73)
    f_dec = 721 * 1440 * ((C + 73) * C + C * 73) * 2
    timeit("decoder_bigskip_bf16",
           lambda t: dec.apply(pd, t[0], t[1]), (x_full, x73), flops=f_dec)

    inorm = InstanceNorm()
    pn = jax.jit(inorm.init)(jax.random.PRNGKey(0), x_full)
    timeit("instancenorm_full f32", lambda v: inorm.apply(pn, v), x_full)
    timeit("instancenorm_full bf16c", lambda v: inorm.apply(pn, v), x_full_bf)
    timeit("instancenorm_down", lambda v: inorm.apply(pn, v), x_dn)

    # pos-embed add (fp32 param read at full res) vs bf16 param
    pe_f32 = jax.jit(lambda k: jax.random.normal(k, (721, 1440, C)))(key)
    pe_bf = jax.jit(lambda v: v.astype(jnp.bfloat16))(pe_f32)
    timeit("posembed_add fp32param", lambda v: v + pe_f32.astype(v.dtype), x_full_bf)
    timeit("posembed_add bf16param", lambda v: v + pe_bf, x_full_bf)

    # film generator (GCN, bf16)
    from msfno_tpu.models.film.wrapper import FilmWrapper
    from msfno_tpu.utils.config import FilmConfig
    from msfno_tpu.data.synthetic import synthetic_land_mask

    fcfg = FilmConfig(film_gen_type="gcn_custom", compute_dtype="bfloat16")
    fw = FilmWrapper(fcfg)
    hs, ws_ = fcfg.sst_shape
    sst_np = np.random.default_rng(0).standard_normal(
        (B, fcfg.temporal_step, hs, ws_)).astype(np.float32)
    sst_np[..., synthetic_land_mask(hs, ws_)] = np.nan
    sst = jnp.asarray(sst_np)
    pf = jax.jit(fw.init)(jax.random.PRNGKey(0), sst)
    timeit("film_gcn_bf16", lambda v: fw.apply(pf, v), sst)


if __name__ == "__main__":
    main()
