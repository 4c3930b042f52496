"""Spectral and pointwise layers for the SFNO (flax.linen, channels-last).

TPU-first re-design of MSFNO/Models/sfno/layers.py:

- layout is (B, H, W, C): the reference's 1x1-conv MLP (layers.py:145-178)
  becomes a Dense over the lane axis -> a single MXU matmul per layer.
- complex spectral weights are stored exactly like the reference checkpoints,
  as fp32 real pairs with trailing dim 2 (layers.py:604-613), and combined via
  jax.lax.complex at use time.
- the SHT and the spectral MLP always run in fp32, independent of the
  surrounding compute dtype (reference fp32 autocast islands,
  layers.py:627-639); no loss scaling is needed on TPU.
"""

from __future__ import annotations

import typing
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from msfno_tpu.ops.activations import complex_relu
from msfno_tpu.parallel.annotate import (
    active_mesh,
    annotate_modes,
    annotate_spectral,
)
from msfno_tpu.ops.contractions import (
    compl_contract_dense,
    compl_contract_tril,
    compl_mul,
    contract_tt,
    to_complex,
)

Array = jax.Array


class SpectralGridIn(typing.NamedTuple):
    """Marker for a block input whose longitude DFT already ran inside the
    fused encoder kernel (ops/pallas/grid_mlp.py:grid_encoder_spectral):
    `f` is the (B, H, 2M, C) stacked [re | im] mode array; the consuming
    filter runs the Legendre stage only (`RealSHT.legendre_stacked`)."""

    f: Array


def trunc_normal_init(std: float = 0.02, a: float = -2.0, b: float = 2.0):
    """Truncated-normal initializer matching the reference trunc_normal_
    (layers.py:29-84): the timm-style cutoffs a/b are ABSOLUTE values, not
    multiples of std — at the std=0.02 the models use, +-2.0 is +-100
    sigma, i.e. effectively untruncated.  (Truncating at +-2 sigma, the
    earlier behavior here, shrinks the effective std by ~12%.)"""

    def init(key, shape, dtype=jnp.float32):
        # normalized bounds; clamp to +-10 sigma — beyond that the fp32
        # normal CDF saturates and the inverse-CDF sampler degenerates,
        # while the distribution is already indistinguishable from normal
        lo = max(a / std, -10.0)
        hi = min(b / std, 10.0)
        return std * jax.random.truncated_normal(key, lo, hi, shape, dtype)

    return init


def scaled_normal_init(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return scale * jax.random.normal(key, shape, dtype)

    return init


def spectral_transforms(fwd, inv, use_pallas: bool = False):
    """Under an active mesh with a lat axis > 1, switch SHT transforms to the
    explicit all_to_all sharded variant (parallel/sharded_sht.py); otherwise
    the plain transforms (GSPMD handles any residual sharding).  Any nlat is
    supported — the sharded transform pads latitude internally, so the
    full-resolution 721-row grid engages too."""
    from msfno_tpu.parallel.annotate import active_mesh
    from msfno_tpu.ops.sht import RealSHT

    mesh = active_mesh()
    if (
        mesh is not None
        and not use_pallas  # fused kernel path expects unsharded modes
        and dict(mesh.shape).get("lat", 1) > 1
        and isinstance(fwd, RealSHT)
    ):
        from msfno_tpu.parallel.sharded_sht import make_sharded_transforms

        return make_sharded_transforms(fwd, inv, mesh, "lat")
    return fwd, inv


class _DenseParams(nn.Module):
    """Parameter holder with nn.Dense's exact tree ({kernel, bias}) for
    paths that hand the weights to a fused kernel instead of calling Dense."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param(
            "kernel", trunc_normal_init(0.02), (in_features, self.features)
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return k, b


def _spatial_stats(y: Array) -> tuple[Array, Array, int]:
    """(ssum, ssq, count) over the spatial axes of (B, ..., C), f32 — the
    instance-norm statistics contract (see InstanceNorm stats=)."""
    y32 = y.astype(jnp.float32)
    axes = tuple(range(1, y.ndim - 1))
    count = 1
    for d in y.shape[1:-1]:
        count *= d
    return jnp.sum(y32, axis=axes), jnp.sum(y32 * y32, axis=axes), count


class Mlp(nn.Module):
    """Dense -> GELU -> Dense over the channel axis.

    Equivalent to the reference's Conv2d(1x1) MLP (layers.py:145-178) in
    channels-last layout.  `output_bias=False` matches the encoder/decoder
    wiring (sfnonet.py:510-520, 630-640).

    `use_pallas=True` routes through the fused grid-MLP kernel
    (ops/pallas/grid_mlp.py): the hidden activation never makes an HBM round
    trip, and the optional `pe` operand fuses the positional-embed add into
    the output write (encoder).  The parameter tree is identical either way.
    """

    hidden_features: int
    out_features: int
    output_bias: bool = True
    drop_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    mxu_dtype: str = "bfloat16"
    # dtype the fused kernel writes (default: compute dtype) — rounding at
    # the kernel's output write instead of a downstream convert is value-
    # identical and halves the full-res write+re-read traffic (round-5
    # trace); the decoder overrides to fp32 so the model's final
    # .astype(float32) is a no-op instead of a 303 MB f32->bf16->f32 pass
    out_dtype: jnp.dtype | None = None
    # with_stats=True: also return per-sample instance-norm statistics
    # (ssum, ssq, count) over the spatial axes so the consumer (block-0
    # norm0) never re-reads the full-res activation; fused in-kernel on the
    # pallas path, a plain jnp reduction otherwise
    with_stats: bool = False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True,
                 pe: Array | None = None, spectral_cs: Array | None = None,
                 affine: tuple[Array, Array] | None = None,
                 residual: Array | None = None):
        # affine: per-sample (B, C_in) channel affine applied to x before
        # fc1 — the block's folded norm1 + FiLM (fuse_mlp_affine);
        # residual: the block's outer identity skip, added to the output.
        # Both run inside the Pallas kernel when available, in jnp
        # otherwise (same math); params are identical either way.
        if self.use_pallas and active_mesh() is None:
            # under an active mesh the (B,H,W,C)->(N,C) flatten + pallas_call
            # has no GSPMD partitioning rule — fall back to plain Denses,
            # which XLA shards along the annotated lat/channel axes
            from msfno_tpu.ops.pallas.grid_mlp import grid_mlp

            k1, b1 = _DenseParams(self.hidden_features, name="fc1")(
                x.shape[-1]
            )
            k2, b2 = _DenseParams(
                self.out_features, use_bias=self.output_bias, name="fc2"
            )(self.hidden_features)
            if spectral_cs is not None:
                # fused encoder->spectral path (grid_encoder_spectral): the
                # MLP output row goes straight through the forward DFT and
                # never reaches HBM; stats accumulate in-kernel
                from msfno_tpu.ops.pallas.grid_mlp import (
                    grid_encoder_spectral,
                )

                assert b2 is None and self.with_stats
                assert self.drop_rate == 0.0
                f, ssum, ssq = grid_encoder_spectral(
                    x, k1, b1, k2,
                    None if pe is None else pe.astype(self.dtype),
                    spectral_cs,
                    mxu_dtype=self.mxu_dtype, out_dtype=self.dtype,
                )
                rows = 1
                for d in x.shape[1:-1]:
                    rows *= d
                return f, (ssum, ssq, rows)
            if self.drop_rate > 0.0 and not deterministic:
                # dropout sits between the fused matmuls: jnp fallback with
                # the same params (training-only path)
                assert affine is None and residual is None, (
                    "fuse_mlp_affine requires drop_rate == 0"
                )
                h = x.astype(self.dtype) @ k1.astype(self.dtype) + b1.astype(
                    self.dtype
                )
                h = nn.gelu(h, approximate=False)
                h = nn.Dropout(self.drop_rate, deterministic=False)(h)
                y = h @ k2.astype(self.dtype)
                if b2 is not None:
                    y = y + b2.astype(self.dtype)
                # pe is added AFTER the output dropout, matching the
                # standard path below (dropout never zeroes the pos-embed)
                y = nn.Dropout(self.drop_rate, deterministic=False)(y)
                if pe is not None:
                    y = y + pe.astype(y.dtype)
                if self.with_stats:
                    return y, _spatial_stats(y)
                return y
            rows = 1
            for d in x.shape[1:-1]:
                rows *= d
            aff2d = None
            if affine is not None:
                assert not self.with_stats and pe is None
                aff2d = tuple(
                    a.reshape(a.shape[0], a.shape[-1]) for a in affine
                )
            y = grid_mlp(
                x, k1, b1, k2, b2=b2,
                # pe read in compute dtype (bf16 halves the 1 GB full-res
                # positional-embed read on the fast tier; the downstream
                # rounding to compute dtype happened anyway)
                pe=None if pe is None else pe.astype(self.dtype),
                mxu_dtype=self.mxu_dtype,
                out_dtype=self.out_dtype or self.dtype,
                stats_rows=rows if self.with_stats else None,
                affine=aff2d,
                residual=residual,
            )
            if self.with_stats:
                y, ssum, ssq = y
                y = y.astype(self.out_dtype or self.dtype)
                if ssum is None:
                    return y, _spatial_stats(y)
                return y, (ssum, ssq, rows)
            return y.astype(self.out_dtype or self.dtype)

        if affine is not None:
            a, b = affine
            x = (
                x.astype(jnp.float32) * a.astype(jnp.float32)
                + b.astype(jnp.float32)
            )
        x = x.astype(self.dtype)
        x = nn.Dense(
            self.hidden_features,
            kernel_init=trunc_normal_init(0.02),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="fc1",
        )(x)
        x = nn.gelu(x, approximate=False)
        if self.drop_rate > 0.0:
            x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        x = nn.Dense(
            self.out_features,
            use_bias=self.output_bias,
            kernel_init=trunc_normal_init(0.02),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="fc2",
        )(x)
        if self.drop_rate > 0.0:
            x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        if pe is not None:
            x = x + pe.astype(x.dtype)
        if residual is not None:
            x = x + residual.astype(x.dtype)
        if self.with_stats:
            return x, _spatial_stats(x)
        return x


class _SplitDense(nn.Module):
    """Dense over concat(x, residual) without materializing the concat; the
    (C_main + C_skip, features) kernel layout matches a plain Dense on the
    concatenated input bit-for-bit (checkpoint compatible)."""

    features: int
    in_main: int
    in_skip: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, residual: Array) -> Array:
        kernel = self.param(
            "kernel",
            trunc_normal_init(0.02),
            (self.in_main + self.in_skip, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k = kernel.astype(self.dtype)
        return (
            x.astype(self.dtype) @ k[: self.in_main]
            + residual.astype(self.dtype) @ k[self.in_main :]
            + bias.astype(self.dtype)
        )


class BigSkipMlp(nn.Module):
    """Decoder MLP over concat(x, residual) WITHOUT materializing the concat.

    The reference concatenates the 73-channel input onto the 256-channel
    features at full resolution before the decoder (big_skip,
    sfnonet.py:679-684) — a ~0.7 GB HBM write + read per step.  The param
    tree ({fc1,fc2}/{kernel,bias}) is identical to the plain Mlp's.
    """

    hidden_features: int
    out_features: int
    in_main: int
    skip_features: int
    output_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    mxu_dtype: str = "bfloat16"
    out_dtype: jnp.dtype | None = None  # see Mlp.out_dtype

    @nn.compact
    def __call__(self, x, residual: Array, deterministic: bool = True):
        if isinstance(x, tuple):
            # fused-tail path: x = (hm, a, b, mt) from the last block's
            # deferred inverse DFT (see blocks._fused_tail) — the inverse
            # DFT, norm/FiLM affine and both decoder matmuls run in ONE
            # Pallas pass; parameter tree unchanged ({fc1,fc2}/{kernel,bias})
            from msfno_tpu.ops.pallas.spectral_decoder import spectral_decoder

            hm, a, b, mt = x
            k1, b1 = _DenseParams(self.hidden_features, name="fc1")(
                self.in_main + self.skip_features
            )
            k2, b2 = _DenseParams(
                self.out_features, use_bias=self.output_bias, name="fc2"
            )(self.hidden_features)
            return spectral_decoder(
                hm, residual, mt, a, b, k1, b1, k2, b2=b2,
                mxu_dtype=self.mxu_dtype,
                out_dtype=self.out_dtype or self.dtype,
            )
        if self.use_pallas and active_mesh() is None:
            # see Mlp: pallas_call cannot be GSPMD-partitioned under a mesh
            from msfno_tpu.ops.pallas.grid_mlp import grid_mlp

            k1, b1 = _DenseParams(self.hidden_features, name="fc1")(
                self.in_main + self.skip_features
            )
            k2, b2 = _DenseParams(
                self.out_features, use_bias=self.output_bias, name="fc2"
            )(self.hidden_features)
            y = grid_mlp(
                x, k1, b1, k2, b2=b2, skip=residual,
                mxu_dtype=self.mxu_dtype,
                out_dtype=self.out_dtype or self.dtype,
            )
            return y.astype(self.out_dtype or self.dtype)

        h = _SplitDense(
            self.hidden_features,
            self.in_main,
            self.skip_features,
            dtype=self.dtype,
            name="fc1",
        )(x, residual)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(
            self.out_features,
            use_bias=self.output_bias,
            kernel_init=trunc_normal_init(0.02),
            dtype=self.dtype,
            name="fc2",
        )(h)
        return h


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over the spatial axes.

    Matches nn.InstanceNorm2d(affine=True, track_running_stats=False)
    as configured in sfnonet.py:492-498.  Always computed in fp32.
    """

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: Array, return_affine: bool = False, stats=None):
        in_dtype = x.dtype
        c = x.shape[-1]
        x32 = x.astype(jnp.float32)
        if stats is not None:
            # precomputed (ssum, ssq, count) per sample — e.g. accumulated
            # inside the producer's Pallas kernel (Mlp.with_stats): the
            # full-res activation is never re-read here.  Same single-pass
            # E[x^2]-E[x]^2 formula as below.
            ssum, ssq, count = stats
            shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (c,)
            mean = (ssum / count).reshape(shape)
            mean_sq = (ssq / count).reshape(shape)
        else:
            # single-pass statistics (E[x^2] - E[x]^2): one read of the
            # (large) activation instead of jnp.var's two, fp32 accumulation
            mean = jnp.mean(x32, axis=(-3, -2), keepdims=True)
            mean_sq = jnp.mean(x32 * x32, axis=(-3, -2), keepdims=True)
        var = jnp.maximum(mean_sq - mean * mean, 0.0)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if return_affine:
            # norm(x) == a*x + b with per-(B, C) a, b: lets the caller fold
            # the normalization into a downstream linear op (the SHT) instead
            # of materializing the normalized field (saves one full-res
            # read + write; see SpectralAttentionS2 norm_affine)
            a = jax.lax.rsqrt(var + self.eps) * scale
            b = bias - mean * jax.lax.rsqrt(var + self.eps) * scale
            return a, b
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(in_dtype)


class SpatialLayerNorm(nn.Module):
    """LayerNorm over the (H, W) axes with per-pixel affine parameters,
    matching nn.LayerNorm(normalized_shape=(H, W)) in sfnonet.py:484-491."""

    spatial_shape: tuple[int, int]
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_dtype = x.dtype
        h, w = self.spatial_shape
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(-3, -2), keepdims=True)
        mean_sq = jnp.mean(x32 * x32, axis=(-3, -2), keepdims=True)
        var = jnp.maximum(mean_sq - mean * mean, 0.0)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        scale = self.param("scale", nn.initializers.ones, (h, w, 1))
        bias = self.param("bias", nn.initializers.zeros, (h, w, 1))
        return (y * scale + bias).astype(in_dtype)


def drop_path(x: Array, rate: float, deterministic: bool, rng=None) -> Array:
    """Stochastic depth per sample (reference layers.py:88-118)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0)


class SpectralAttentionS2(nn.Module):
    """Non-linear spectral filter: complex MLP over retained (l, m) modes.

    Reference: SpectralAttentionS2 (layers.py:536-641), the default filter
    ("non-linear", sfnonet.py:428).  spectral_layers complex Dense layers
    C -> hidden (+ ComplexReLU "real") followed by a C_out projection; the
    weights are shared across modes, so each layer is one complex matmul.
    Runs fully in fp32 together with its enclosing transforms.
    """

    forward_transform: Callable
    inverse_transform: Callable
    embed_dim: int
    hidden_size_factor: float = 2.0
    complex_activation: str = "real"
    spectral_layers: int = 1
    scale: float = 0.02
    drop_rate: float = 0.0  # per-spectral-layer dropout (ref layers.py:491)
    use_pallas: bool = False  # fused VMEM-resident kernel (ops/pallas)
    mxu_dtype: str = "float32"

    def _transforms(self):
        return spectral_transforms(
            self.forward_transform, self.inverse_transform, self.use_pallas
        )

    @nn.compact
    def __call__(self, x: Array, norm_affine=None,
                 deterministic: bool = True,
                 defer_inverse: bool = False) -> Array:
        hidden = int(self.hidden_size_factor * self.embed_dim)
        forward_transform, inverse_transform = self._transforms()
        if isinstance(x, SpectralGridIn):
            # longitude DFT already ran inside the fused encoder kernel
            from msfno_tpu.ops.sht import RealSHT

            assert isinstance(forward_transform, RealSHT)
            in_dtype = x.f.dtype
            x = forward_transform.legendre_stacked(x.f)
        else:
            in_dtype = x.dtype
            x = forward_transform(x.astype(jnp.float32))
        if norm_affine is not None:
            # Fused instance-norm: the block passed norm(x) = a*x + b as
            # (a, b) instead of materializing it.  Both SHT stages are linear,
            # so SHT(a*x + b) = a*SHT(x) + b*SHT(1); the constant field only
            # excites the m=0 column with profile s0_l = sum_k w[0, l, k]
            # (DFT of a constant is delta_{m0}).  The fix-up runs on the
            # (B, L, M, C) spectral array — 8x smaller than the grid.
            from msfno_tpu.ops.sht import RealSHT

            assert isinstance(self.forward_transform, RealSHT)
            a, b = norm_affine  # (B, 1, 1, C) fp32 each
            s0 = jnp.asarray(
                self.forward_transform.weights[0].sum(-1)
            )  # (lmax,)
            x = x * a.astype(jnp.float32)
            add = b[:, 0, :, :] * s0[None, :, None]  # (B, L, C)
            mmax = x.shape[-2]
            add = jnp.pad(
                add[:, :, None, :], ((0, 0), (0, 0), (0, mmax - 1), (0, 0))
            )
            x = x + jax.lax.complex(add, jnp.zeros_like(add))
        x = annotate_spectral(x)

        dims = [self.embed_dim] + [hidden] * self.spectral_layers
        ws = [
            self.param(
                f"w{layer}",
                scaled_normal_init(self.scale),
                (dims[layer], dims[layer + 1], 2),
            )
            for layer in range(self.spectral_layers)
        ]
        wout = self.param(
            "wout", scaled_normal_init(self.scale), (hidden, self.embed_dim, 2)
        )
        # modulus/halfplane ComplexReLU carries a TRAINED bias (reference
        # activations.py:15-19, bias_shape=(hidden, 1, 1) -> channels-last
        # (hidden,)); for real/cartesian it is a zero buffer and dropped
        act_bias = (
            self.param("act_bias", nn.initializers.zeros, (hidden,))
            if self.complex_activation in ("modulus", "halfplane")
            else None
        )
        dropping = self.drop_rate > 0.0 and not deterministic

        if self.use_pallas and self.complex_activation == "real" and not dropping:
            from msfno_tpu.ops.pallas.spectral_mlp import spectral_mlp

            x = spectral_mlp(x, ws + [wout], mxu_dtype=self.mxu_dtype)
        else:
            from msfno_tpu.ops.sht import _matmul_precision

            prec = _matmul_precision(self.mxu_dtype)
            for layer in range(self.spectral_layers):
                x = compl_mul(x, to_complex(ws[layer]), precision=prec)
                x = complex_relu(x, mode=self.complex_activation,
                                 bias=act_bias)
                if dropping:
                    # reference applies Dropout on the complex activation
                    # after each spectral layer (layers.py:491, 506)
                    x = nn.Dropout(self.drop_rate, deterministic=False)(x)
            x = compl_mul(x, to_complex(wout), precision=prec)
        x = annotate_spectral(x)

        if defer_inverse:
            # fused-tail path (ops/pallas/spectral_decoder.py): hand back the
            # fp32 Legendre-synthesis intermediate; the caller runs the
            # inverse DFT inside the fused decoder kernel
            from msfno_tpu.ops.sht import InverseRealSHT

            assert isinstance(inverse_transform, InverseRealSHT)
            return inverse_transform.synthesis_hm(x)
        x = inverse_transform(x)
        return x.astype(in_dtype)


class SpectralConvS2(nn.Module):
    """Linear spectral filter: dense per-mode channel mixing over the
    triangular (l >= m) mode set, optionally tensor-train compressed.

    Reference: SpectralConvS2 (layers.py:336-427).  The (l, m) gather/scatter
    uses static index arrays (XLA-friendly); modes with l < m stay zero.
    """

    forward_transform: Callable
    inverse_transform: Callable
    embed_dim: int
    compression: str | None = None
    rank: int = 128
    scale: float = 0.02

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_dtype = x.dtype
        lmax = self.forward_transform.lmax
        mmax = self.forward_transform.mmax
        ii, jj = np.tril_indices(lmax, m=mmax)
        k = len(ii)

        forward_transform, inverse_transform = spectral_transforms(
            self.forward_transform, self.inverse_transform
        )
        x = forward_transform(x.astype(jnp.float32))
        # the sharded transforms may store the m axis in an interleaved
        # (round-robin) layout for load balance; map the canonical tril
        # column indices through mode_inv (identity when unsharded)
        mode_inv = getattr(forward_transform, "mode_inv", None)
        if mode_inv is not None:
            jj = mode_inv[jj]
        # tril gather over the (possibly m-sharded) dense mode rectangle:
        # under a mesh GSPMD turns this into a balanced gather and the
        # per-mode contraction below runs sharded over the K axis
        xk = x[..., ii, jj, :]  # (..., K, C)
        xk = annotate_modes(xk)

        if self.compression == "tt":
            g1 = self.param(
                "w0", scaled_normal_init(self.scale), (self.embed_dim, self.rank, 2)
            )
            g2 = self.param(
                "w1",
                scaled_normal_init(self.scale),
                (self.rank, self.embed_dim, self.rank, 2),
            )
            g3 = self.param("w2", scaled_normal_init(self.scale), (self.rank, k, 2))
            yk = contract_tt(xk, to_complex(g1), to_complex(g2), to_complex(g3))
        else:
            w = self.param(
                "w",
                scaled_normal_init(self.scale),
                (k, self.embed_dim, self.embed_dim, 2),
            )
            yk = compl_contract_tril(xk, to_complex(w))

        y = jnp.zeros(x.shape[:-1] + (self.embed_dim,), x.dtype)
        y = y.at[..., ii, jj, :].set(yk)
        y = inverse_transform(y)
        return y.astype(in_dtype)


# NOTE: the reference's SpectralAttention2d (layers.py:430-533) has no
# separate class here: the spectral MLP is transform-agnostic, so make_filter
# (blocks.py) builds SpectralAttentionS2 directly for the fft path — keeping
# the param scope at filter/w* so converted reference weights land in the
# same tree (a wrapper with an inner sub-scope would break that silently).


class SpectralConv2d(nn.Module):
    """Linear spectral filter on the FFT grid: dense per-mode mixing over the
    full rectangular mode set (reference SpectralConv2d, layers.py:253-333).
    """

    forward_transform: Callable
    inverse_transform: Callable
    embed_dim: int
    scale: float | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_dtype = x.dtype
        lmax = self.forward_transform.lmax
        mmax = self.forward_transform.mmax
        scale = self.scale if self.scale is not None else 1.0 / self.embed_dim**2
        x = self.forward_transform(x.astype(jnp.float32))
        w = self.param(
            "w",
            scaled_normal_init(scale),
            (lmax, mmax, self.embed_dim, self.embed_dim, 2),
        )
        y = compl_contract_dense(x, to_complex(w))
        y = self.inverse_transform(y)
        return y.astype(in_dtype)
