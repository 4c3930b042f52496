"""SFNO blocks and FiLM modulation (reference MSFNO/Models/sfno/sfnonet.py).

Block wiring truth table (sfnonet.py:573-614):
  - block 0:            no skips, transforms change resolution down
  - blocks 1..N-2:      inner_skip = 1x1 linear, outer_skip = identity
  - block N-1:          no skips, no channel MLP, resolution back up
  - filter "linear":    GELU after the inner skip
  - norms: norm0 at the block's input resolution, norm1 at its output
Filmed block (sfnonet.py:254-393): FiLM between norm1 and the channel MLP.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from msfno_tpu.parallel.annotate import annotate_grid
from msfno_tpu.models.sfno.layers import (
    InstanceNorm,
    Mlp,
    SpatialLayerNorm,
    SpectralAttentionS2,
    SpectralConv2d,
    SpectralConvS2,
    drop_path,
    trunc_normal_init,
)

Array = jax.Array


def film_modulation(x: Array, gamma: Array, beta: Array, scale) -> Array:
    """FiLM: ((1 + gamma*scale) * x) + beta*scale (reference FiLM module,
    sfnonet.py:689-697).  gamma/beta are (B, C); x is (B, H, W, C)."""
    g = gamma[:, None, None, :].astype(x.dtype)
    b = beta[:, None, None, :].astype(x.dtype)
    return (1.0 + g * scale) * x + b * scale


def make_norm(kind: str, spatial_shape: tuple[int, int], name: str):
    if kind == "instance_norm":
        return InstanceNorm(name=name)
    if kind == "layer_norm":
        return SpatialLayerNorm(spatial_shape, name=name)
    raise NotImplementedError(f"normalization {kind!r} not implemented")


def make_filter(
    filter_type: str,
    spectral_transform: str,
    forward_transform,
    inverse_transform,
    embed_dim: int,
    mlp_ratio: float,
    complex_activation: str,
    spectral_layers: int,
    compression,
    rank: int,
    use_pallas: bool = False,
    mxu_dtype: str = "float32",
    drop_rate: float = 0.0,
    name: str = "filter",
):
    """SpectralFilterLayer mux (reference sfnonet.py:60-133)."""
    if filter_type == "non-linear" and spectral_transform == "sht":
        return SpectralAttentionS2(
            forward_transform,
            inverse_transform,
            embed_dim,
            hidden_size_factor=mlp_ratio,
            complex_activation=complex_activation,
            spectral_layers=spectral_layers,
            drop_rate=drop_rate,
            use_pallas=use_pallas,
            mxu_dtype=mxu_dtype,
            name=name,
        )
    if filter_type == "non-linear" and spectral_transform == "fft":
        # the spectral MLP is transform-agnostic; building SpectralAttentionS2
        # directly keeps the param scope identical to the sht path (filter/w*)
        # so converted reference weights land in the same tree
        return SpectralAttentionS2(
            forward_transform,
            inverse_transform,
            embed_dim,
            hidden_size_factor=mlp_ratio,
            complex_activation=complex_activation,
            spectral_layers=spectral_layers,
            drop_rate=drop_rate,
            name=name,
        )
    if filter_type == "linear" and spectral_transform == "sht":
        return SpectralConvS2(
            forward_transform,
            inverse_transform,
            embed_dim,
            compression=compression,
            rank=rank,
            name=name,
        )
    if filter_type == "linear" and spectral_transform == "fft":
        return SpectralConv2d(
            forward_transform, inverse_transform, embed_dim, name=name
        )
    raise NotImplementedError(f"filter {filter_type}/{spectral_transform}")


class FourierNeuralOperatorBlock(nn.Module):
    """One SFNO block; optionally FiLM-modulated.

    When `filmed` is True the call signature grows (gamma, beta, scale) and
    modulation is applied between norm1 and the channel MLP
    (reference FourierNeuralOperatorBlock_Filmed.forward, sfnonet.py:357-393).
    """

    forward_transform: Callable
    inverse_transform: Callable
    embed_dim: int
    filter_type: str = "non-linear"
    spectral_transform: str = "sht"
    mlp_ratio: float = 2.0
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    norm_kind: str = "instance_norm"
    input_shape: tuple[int, int] = (0, 0)  # (H, W) at block input
    output_shape: tuple[int, int] = (0, 0)  # (H, W) at block output
    inner_skip: str | None = None  # None | "linear" | "identity"
    outer_skip: str | None = None
    use_mlp: bool = True
    complex_activation: str = "real"
    spectral_layers: int = 1
    compression: str | None = None
    rank: int = 128
    use_pallas: bool = False
    mxu_dtype: str = "float32"
    pallas_grid_mlp: bool = False
    grid_mlp_mxu_dtype: str = "bfloat16"
    checkpointing_mlp: bool = False
    fuse_norm: bool = True  # fold instance-norm into the forward SHT
    # fold norm1 + FiLM into the channel-MLP kernel as a per-sample channel
    # affine, and the outer identity skip into its output write — the
    # normalized/modulated field never hits HBM (round-5 trace: the
    # inter-kernel glue at 120x240 cost 2.4 ms/step across 489 fusions)
    fuse_mlp_affine: bool = False
    filmed: bool = False
    checkpointing: bool = False
    dtype: jnp.dtype = jnp.float32
    # fused-tail (LAST block only, set by the net): skip the inverse DFT and
    # return (hm, a, b) — the Legendre-synthesis intermediate plus the
    # combined norm1+FiLM affine — for the fused spectral->output decoder
    # kernel (ops/pallas/spectral_decoder.py).  The caller guarantees:
    # non-linear SHT filter on the matmul-DFT path, instance norm, no
    # inner/outer skip, no channel MLP, no drop path, no active mesh.
    fuse_tail: bool = False

    @nn.compact
    def __call__(
        self,
        x: Array,
        gamma: Array | None = None,
        beta: Array | None = None,
        scale=1.0,
        deterministic: bool = True,
        norm0_stats=None,
    ) -> Array:
        residual = x

        if self.fuse_tail:
            return self._fused_tail(
                x, gamma, beta, scale, deterministic, norm0_stats
            )

        filt = make_filter(
            self.filter_type,
            self.spectral_transform,
            self.forward_transform,
            self.inverse_transform,
            self.embed_dim,
            self.mlp_ratio,
            self.complex_activation,
            self.spectral_layers,
            self.compression,
            self.rank,
            self.use_pallas,
            self.mxu_dtype,
            drop_rate=self.drop_rate,
        )
        norm0 = make_norm(self.norm_kind, self.input_shape, "norm0")
        from msfno_tpu.models.sfno.layers import SpectralGridIn

        spectral_in = isinstance(x, SpectralGridIn)
        if spectral_in:
            # fused encoder->spectral input: only valid on the norm-fold
            # path with no skips (the net's gate guarantees it)
            assert (
                self.fuse_norm
                and self.norm_kind == "instance_norm"
                and self.filter_type == "non-linear"
                and self.spectral_transform == "sht"
                and self.inner_skip is None
                and self.outer_skip is None
                and norm0_stats is not None
            ), "SpectralGridIn on an incompatible block configuration"
        if (
            self.fuse_norm
            and self.norm_kind == "instance_norm"
            and self.filter_type == "non-linear"
            and self.spectral_transform == "sht"
        ):
            # fold norm0 into the filter's forward SHT (see
            # SpectralAttentionS2.norm_affine): skips materializing the
            # normalized field — one full-res read + write saved on block 0.
            # norm0_stats (encoder-kernel-accumulated, Mlp.with_stats) skips
            # even the statistics read of the full-res activation.
            a, b = norm0(x.f if spectral_in else x, True, norm0_stats)
            x = filt(x, norm_affine=(a, b), deterministic=deterministic)
        else:
            if norm0_stats is not None and self.norm_kind == "instance_norm":
                x = norm0(x, stats=norm0_stats)
            else:
                x = norm0(x)
            if self.filter_type == "non-linear":
                x = filt(x, deterministic=deterministic)
            else:
                x = filt(x)

        if self.inner_skip == "linear":
            x = x + nn.Dense(
                self.embed_dim,
                kernel_init=trunc_normal_init(0.02),
                dtype=self.dtype,
                name="inner_skip",
            )(residual)
        elif self.inner_skip == "identity":
            x = x + residual

        if self.filter_type == "linear":
            x = nn.gelu(x, approximate=False)

        fuse_affine = (
            self.fuse_mlp_affine
            and self.use_mlp
            and self.norm_kind == "instance_norm"
            and self.drop_rate == 0.0
            and self.drop_path_rate == 0.0
            and not self.checkpointing_mlp
            and self.outer_skip in (None, "identity")
        )
        if fuse_affine:
            # norm1(x) == a*x + b per (B, C); FiLM folds in on top:
            # (1+gamma*s)*(a*x + b) + beta*s — one affine, applied inside
            # the MLP kernel.  Parameter tree identical to the unfused path.
            a, b = make_norm(self.norm_kind, self.output_shape, "norm1")(
                x, True
            )
            if self.filmed:
                g = 1.0 + gamma[:, None, None, :].astype(a.dtype) * scale
                a, b = g * a, g * b + beta[:, None, None, :].astype(
                    a.dtype
                ) * scale
            x = Mlp(
                hidden_features=int(self.embed_dim * self.mlp_ratio),
                out_features=self.embed_dim,
                drop_rate=self.drop_rate,
                dtype=self.dtype,
                use_pallas=self.pallas_grid_mlp,
                mxu_dtype=self.grid_mlp_mxu_dtype,
                name="mlp",
            )(
                x,
                deterministic,
                affine=(a, b),
                residual=(
                    residual if self.outer_skip == "identity" else None
                ),
            )
            return annotate_grid(x)

        x = make_norm(self.norm_kind, self.output_shape, "norm1")(x)

        if self.filmed:
            x = film_modulation(x, gamma, beta, scale)

        if self.use_mlp:
            mlp_cls = (
                nn.remat(Mlp, static_argnums=(2,))
                if self.checkpointing_mlp
                else Mlp
            )
            x = mlp_cls(
                hidden_features=int(self.embed_dim * self.mlp_ratio),
                out_features=self.embed_dim,
                drop_rate=self.drop_rate,
                dtype=self.dtype,
                use_pallas=self.pallas_grid_mlp,
                mxu_dtype=self.grid_mlp_mxu_dtype,
                name="mlp",
            )(x, deterministic)

        if self.drop_path_rate > 0.0:
            rng = self.make_rng("droppath") if not deterministic else None
            x = drop_path(x, self.drop_path_rate, deterministic, rng)

        if self.outer_skip == "linear":
            x = x + nn.Dense(
                self.embed_dim,
                kernel_init=trunc_normal_init(0.02),
                dtype=self.dtype,
                name="outer_skip",
            )(residual)
        elif self.outer_skip == "identity":
            x = x + residual

        return annotate_grid(x)

    def _fused_tail(self, x, gamma, beta, scale, deterministic, norm0_stats):
        """Last-block body for the fused decoder tail: identical math to the
        standard path up to (and including) the norm1+FiLM affine, but the
        inverse DFT is deferred and the affine returned in folded (a, b)
        form — the grid-space field is never materialized (round-5 trace:
        5.65 ms/step of transpose + statistics + decoder traffic)."""
        from msfno_tpu.ops.pallas.spectral_decoder import spectral_grid_stats

        assert (
            self.filter_type == "non-linear"
            and self.spectral_transform == "sht"
            and self.norm_kind == "instance_norm"
            and self.inner_skip is None
            and self.outer_skip is None
            and not self.use_mlp
            and self.drop_path_rate == 0.0
        ), "fuse_tail set on an incompatible block configuration"
        filt = make_filter(
            self.filter_type,
            self.spectral_transform,
            self.forward_transform,
            self.inverse_transform,
            self.embed_dim,
            self.mlp_ratio,
            self.complex_activation,
            self.spectral_layers,
            self.compression,
            self.rank,
            self.use_pallas,
            self.mxu_dtype,
            drop_rate=self.drop_rate,
        )
        norm0 = make_norm(self.norm_kind, self.input_shape, "norm0")
        a0, b0 = norm0(x, True, norm0_stats)
        hm = filt(x, norm_affine=(a0, b0), deterministic=deterministic,
                  defer_inverse=True)

        itrans = self.inverse_transform
        mean, mean_sq = spectral_grid_stats(hm, itrans.mode_power_weights)
        norm1 = make_norm(self.norm_kind, self.output_shape, "norm1")
        # InstanceNorm's stats contract is (ssum, ssq, count); the spectral
        # identities already yield means, so count=1
        a1, b1 = norm1(hm, True, (mean, mean_sq, 1.0))
        a1 = a1[:, 0, 0, :]
        b1 = b1[:, 0, 0, :]
        if self.filmed:
            # film_modulation(norm(x)) = (1+g*s)*(a1*x+b1) + beta*s
            g = 1.0 + gamma.astype(jnp.float32) * scale
            return hm, a1 * g, b1 * g + beta.astype(jnp.float32) * scale
        return hm, a1, b1
