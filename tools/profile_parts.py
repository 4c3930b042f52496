import sys, os; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import time, functools
import jax, jax.numpy as jnp, numpy as np
from msfno_tpu.ops.sht import RealSHT, InverseRealSHT

_red = jax.jit(lambda t: jnp.sum(jnp.abs(t).astype(jnp.float32)))


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(_red(leaf)))


def timeit(name, f, *args, iters=10, chain=False):
    out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    x = args
    for _ in range(iters):
        out = f(*x)
        if chain:
            x = (out,) + args[1:]
    _sync(out)
    dt = (time.perf_counter()-t0)/iters
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt

B, C = 1, 256
full = (B, 721, 1440, C)
down = (B, 120, 240, C)

sht_full = RealSHT(721,1440,lmax=120,mmax=121,grid="equiangular",spectral_rescale=1e5)
isht_full = InverseRealSHT(721,1440,lmax=120,mmax=121,grid="equiangular",spectral_rescale=1e5)
sht_dn = RealSHT(120,240,lmax=120,mmax=121,grid="legendre-gauss",spectral_rescale=1e5)
isht_dn = InverseRealSHT(120,240,lmax=120,mmax=121,grid="legendre-gauss",spectral_rescale=1e5)

x_full = jnp.ones(full, jnp.float32)
x_dn = jnp.ones(down, jnp.float32)
# NOTE: never create complex arrays eagerly on axon (host->device
# transfer of complex is UNIMPLEMENTED and wedges the session);
# build them inside jit instead
coeffs = jax.jit(lambda: jax.lax.complex(jnp.ones((B,120,121,C)), jnp.zeros((B,120,121,C))))()

timeit("sht_full_fwd", jax.jit(sht_full), x_full)
timeit("isht_full", jax.jit(isht_full), coeffs)
timeit("sht_down_fwd", jax.jit(sht_dn), x_dn)
timeit("isht_down", jax.jit(isht_dn), coeffs)

# rfft alone at full res
timeit("rfft_full", jax.jit(lambda v: jnp.fft.rfft(v, axis=-2, norm="forward")), x_full)
timeit("rfft_down", jax.jit(lambda v: jnp.fft.rfft(v, axis=-2, norm="forward")), x_dn)

# legendre einsum alone
w = jnp.ones((121,120,721), jnp.float32)
fh = jnp.ones((B,721,121,C), jnp.float32)
timeit("legendre_full_re", jax.jit(lambda w,f: jnp.einsum("mlh,bhmc->blmc", w, f)), w, fh)
wd = jnp.ones((121,120,120), jnp.float32)
fd = jnp.ones((B,120,121,C), jnp.float32)
timeit("legendre_down_re", jax.jit(lambda w,f: jnp.einsum("mlh,bhmc->blmc", w, f)), wd, fd)

# spectral mlp einsum path (1 block)
from msfno_tpu.ops.contractions import compl_mul, to_complex
from msfno_tpu.ops.activations import complex_relu
key = jax.random.PRNGKey(0)
ws = []
dims = [256,512,512,512,256]
for i in range(4):
    key,k = jax.random.split(key)
    ws.append(0.02*jax.random.normal(k,(dims[i],dims[i+1],2),jnp.float32))
def smlp(x):
    for w_ in ws[:-1]:
        x = compl_mul(x, to_complex(w_)); x = complex_relu(x, mode="real")
    return compl_mul(x, to_complex(ws[-1]))
timeit("spectral_mlp_einsum", jax.jit(smlp), coeffs)
from msfno_tpu.ops.pallas.spectral_mlp import spectral_mlp
timeit("spectral_mlp_pallas_f32", jax.jit(lambda v: spectral_mlp(v, ws)), coeffs)
timeit("spectral_mlp_pallas_bf16", jax.jit(lambda v: spectral_mlp(v, ws, mxu_dtype="bfloat16")), coeffs)

# encoder/decoder mlp at full res (bf16)
from msfno_tpu.models.sfno.layers import Mlp
enc = Mlp(hidden_features=256, out_features=256, output_bias=False, dtype=jnp.bfloat16)
x73 = jnp.ones((B,721,1440,73), jnp.float32)
p = jax.jit(enc.init)(jax.random.PRNGKey(0), x73)
timeit("encoder_bf16", jax.jit(lambda p,v: enc.apply(p,v)), p, x73)

# instance norm at full res
from msfno_tpu.models.sfno.layers import InstanceNorm
inorm = InstanceNorm()
pn = jax.jit(inorm.init)(jax.random.PRNGKey(0), x_full)
timeit("instancenorm_full", jax.jit(lambda p,v: inorm.apply(p,v)), pn, x_full)
timeit("instancenorm_down", jax.jit(lambda p,v: inorm.apply(p,v)), pn, x_dn)
