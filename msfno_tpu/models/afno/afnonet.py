"""AFNONet — FourCastNet v1 baseline (reference
MSFNO/Models/fourcastnet/afnonet.py:59-484), kept as a comparison model
family (SURVEY.md section 2.5: --model fcn).

TPU-native notes: channels-last throughout; the AFNO2D kept-mode region is
computed by slice -> block-diag complex MLP -> pad-back (static shapes)
instead of the reference's zero-buffer index assignment; the patch embed is a
reshape + Dense (equivalent to stride-p conv, MXU-friendly).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange

from msfno_tpu.models.sfno.layers import scaled_normal_init, trunc_normal_init

Array = jax.Array


def softshrink(x: Array, lambd: float) -> Array:
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - lambd, 0.0)


class AFNO2D(nn.Module):
    """Block-diagonal spectral mixing via rfft2 (reference afnonet.py:109-280)."""

    hidden_size: int
    num_blocks: int = 8
    sparsity_threshold: float = 0.01
    hard_thresholding_fraction: float = 1.0
    hidden_size_factor: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.hidden_size % self.num_blocks:
            raise ValueError("hidden_size must divide into num_blocks")
        bias = x
        in_dtype = x.dtype
        x = x.astype(jnp.float32)
        b, h, w, c = x.shape
        nb, bs = self.num_blocks, self.hidden_size // self.num_blocks
        hf = self.hidden_size_factor

        w1 = self.param("w1", scaled_normal_init(0.02), (2, nb, bs, bs * hf))
        b1 = self.param("b1", scaled_normal_init(0.02), (2, nb, bs * hf))
        w2 = self.param("w2", scaled_normal_init(0.02), (2, nb, bs * hf, bs))
        b2 = self.param("b2", scaled_normal_init(0.02), (2, nb, bs))

        xf = jnp.fft.rfft2(x, axes=(1, 2), norm="ortho")
        xf = xf.reshape(b, h, w // 2 + 1, nb, bs)

        total_modes = h // 2 + 1
        kept = int(total_modes * self.hard_thresholding_fraction)
        # kept region: rows [total-kept, total+kept), cols [0, kept)
        r0, r1 = total_modes - kept, total_modes + kept
        xk = xf[:, r0:r1, :kept]

        mul = lambda a, wgt: jnp.einsum(
            "...bi,bio->...bo", a, wgt, preferred_element_type=jnp.float32
        )
        xr, xi = jnp.real(xk), jnp.imag(xk)
        o1r = jax.nn.relu(mul(xr, w1[0]) - mul(xi, w1[1]) + b1[0])
        o1i = jax.nn.relu(mul(xi, w1[0]) + mul(xr, w1[1]) + b1[1])
        o2r = mul(o1r, w2[0]) - mul(o1i, w2[1]) + b2[0]
        o2i = mul(o1i, w2[0]) + mul(o1r, w2[1]) + b2[1]

        o2r = softshrink(o2r, self.sparsity_threshold)
        o2i = softshrink(o2i, self.sparsity_threshold)
        ok = jax.lax.complex(o2r, o2i)

        out = jnp.zeros_like(xf)
        out = out.at[:, r0:r1, :kept].set(ok)
        out = out.reshape(b, h, w // 2 + 1, c)
        y = jnp.fft.irfft2(out, s=(h, w), axes=(1, 2), norm="ortho")
        return y.astype(in_dtype) + bias


class AFNOBlock(nn.Module):
    """norm -> AFNO2D -> (+residual) -> norm -> MLP -> +residual
    (reference Block, afnonet.py:283-323)."""

    dim: int
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    num_blocks: int = 8
    sparsity_threshold: float = 0.01
    hard_thresholding_fraction: float = 1.0
    double_skip: bool = True

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        residual = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        x = AFNO2D(
            self.dim,
            self.num_blocks,
            self.sparsity_threshold,
            self.hard_thresholding_fraction,
            name="filter",
        )(x)
        if self.double_skip:
            x = x + residual
            residual = x
        x = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = int(self.dim * self.mlp_ratio)
        y = nn.Dense(h, kernel_init=trunc_normal_init(0.02), name="mlp_fc1")(x)
        y = nn.gelu(y, approximate=False)
        if self.drop_rate > 0.0:
            y = nn.Dropout(self.drop_rate, deterministic=deterministic)(y)
        y = nn.Dense(self.dim, kernel_init=trunc_normal_init(0.02), name="mlp_fc2")(y)
        if self.drop_rate > 0.0:
            # timm-style Mlp: dropout after BOTH the activation and fc2
            # (reference afnonet.py:98-105)
            y = nn.Dropout(self.drop_rate, deterministic=deterministic)(y)
        return y + residual


class AFNONet(nn.Module):
    """Patch-embedded AFNO transformer (reference AFNONet, afnonet.py:350-458).

    Input/output: (B, H, W, C) channels-last.
    """

    img_size: tuple[int, int] = (720, 1440)
    patch_size: tuple[int, int] = (8, 8)
    in_chans: int = 26
    out_chans: int = 26
    embed_dim: int = 768
    depth: int = 12
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    num_blocks: int = 8
    sparsity_threshold: float = 0.01
    hard_thresholding_fraction: float = 1.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        ph, pw = self.patch_size
        gh, gw = self.img_size[0] // ph, self.img_size[1] // pw
        # patch embed as reshape + Dense (== stride-p conv)
        x = rearrange(x, "b (h p1) (w p2) c -> b h w (p1 p2 c)", p1=ph, p2=pw)
        x = nn.Dense(
            self.embed_dim, kernel_init=trunc_normal_init(0.02), name="patch_embed"
        )(x)
        pos = self.param(
            "pos_embed", trunc_normal_init(0.02), (gh, gw, self.embed_dim)
        )
        x = x + pos[None]
        if self.drop_rate > 0.0:
            # pos_drop after the positional-embed add (reference
            # afnonet.py:385, 435)
            x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)
        for i in range(self.depth):
            x = AFNOBlock(
                self.embed_dim,
                self.mlp_ratio,
                self.drop_rate,
                self.num_blocks,
                self.sparsity_threshold,
                self.hard_thresholding_fraction,
                name=f"blocks_{i}",
            )(x, deterministic)
        x = nn.Dense(
            self.out_chans * ph * pw,
            use_bias=False,
            kernel_init=trunc_normal_init(0.02),
            name="head",
        )(x)
        return rearrange(
            x, "b h w (p1 p2 c) -> b (h p1) (w p2) c", p1=ph, p2=pw
        )


class PrecipNet(nn.Module):
    """Precipitation head: periodic-pad 3x3 conv + ReLU over the backbone
    output (reference PrecipNet, afnonet.py:326-348)."""

    backbone: AFNONet

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        x = self.backbone(x, deterministic)
        # periodic in lon (axis 2), zero-pad in lat (axis 1)
        x = jnp.concatenate([x[:, :, -1:], x, x[:, :, :1]], axis=2)
        x = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
        x = nn.Conv(
            x.shape[-1], kernel_size=(3, 3), padding="VALID", name="conv"
        )(x)
        return jax.nn.relu(x)


def unlog_tp(x: Array, eps: float = 1e-5) -> Array:
    """Inverse log-precip transform (reference afnonet.py:55-60)."""
    return eps * (jnp.exp(x) - 1.0)
