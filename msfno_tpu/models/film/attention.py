"""Shared transformer building blocks for the FiLM generators.

Masked pre-norm attention + feed-forward and static patchify/unpatchify.
Reference counterparts: MSFNO/Models/vit/vit.py (Attention/FeedForward/
Transformer) and MSFNO/Models/mae/maenet.py (MHA/FFN,
Transformer_patch_embedding/_reconstruction).

TPU-native choice: the reference drops NaN-dominated tokens, giving dynamic
token counts (vit.py:119-160, maenet.py:304-336).  Here the token count stays
static; invalid tokens are excluded via an additive attention bias over keys
and from any pooling — the standard static-shape reformulation.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange

Array = jax.Array

NEG_INF = -1e9


def patchify(x: Array, pt: int, ph: int, pw: int) -> Array:
    """(B, T, H, W) -> (B, N, pt*ph*pw) token grid, N = (T/pt)(H/ph)(W/pw)."""
    return rearrange(
        x, "b (t pt) (h ph) (w pw) -> b (t h w) (pt ph pw)", pt=pt, ph=ph, pw=pw
    )


def unpatchify(tok: Array, pt: int, ph: int, pw: int, t: int, h: int, w: int) -> Array:
    """(B, N, pt*ph*pw) -> (B, T, H, W)."""
    return rearrange(
        tok,
        "b (t h w) (pt ph pw) -> b (t pt) (h ph) (w pw)",
        pt=pt,
        ph=ph,
        pw=pw,
        t=t,
        h=h,
        w=w,
    )


def token_validity(tokens: Array, nan_threshold: float) -> tuple[Array, Array]:
    """(nan_mask per element, valid per token) from NaN content.

    Matches Transformer_patch_embedding.rm_embed_nan semantics
    (maenet.py:318-327): a token is valid iff its NaN ratio < threshold.
    """
    nan_mask = jnp.isnan(tokens)
    ratio = jnp.mean(nan_mask.astype(jnp.float32), axis=-1)
    return nan_mask, ratio < nan_threshold


# NOTE: the reference's posemb_sincos_2d (vit.py:63-74) is dead upstream —
# it is computed (vit.py:195) but every use is commented out; both codebases
# position-encode with the LEARNED encoder/decoder_position_code params.


class MaskedAttention(nn.Module):
    """Pre-norm multi-head self-attention with a key-validity mask.

    Reference: vit.py Attention (qk scaled dot-product) and maenet.py MHA.
    """

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32  # computation dtype; params stay fp32

    @nn.compact
    def __call__(
        self, x: Array, valid: Array | None = None, deterministic: bool = True
    ) -> Array:
        inner = self.heads * self.dim_head
        y = nn.LayerNorm(name="norm", dtype=self.dtype)(x)
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv",
                       dtype=self.dtype)(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda t: rearrange(t, "b n (h d) -> b h n d", h=self.heads)
        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("bhnd,bhmd->bhnm", q, k) * self.dim_head**-0.5
        if valid is not None:
            bias = jnp.where(valid[:, None, None, :], 0.0, NEG_INF)
            scores = scores + bias
        attn = jax.nn.softmax(scores, axis=-1)
        if self.dropout > 0.0:
            attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = rearrange(out, "b h n d -> b n (h d)")
        return nn.Dense(self.dim, name="to_out", dtype=self.dtype)(out)


class FeedForward(nn.Module):
    """LayerNorm -> Dense -> GELU -> Dense (reference vit.py FeedForward)."""

    dim: int
    hidden_dim: int
    dropout: float = 0.0
    out_dim: int | None = None
    dtype: jnp.dtype = jnp.float32
    # reference mae film-head init: uniform(-s, s), s = 1/sqrt(fan_in)/scale
    # (sfnonet.py:884-889, divisor = cfg.scale_weight); None = flax default
    init_scale: float | None = None

    def _inits(self, fan_in: int):
        if self.init_scale is None:
            return {}
        s = 1.0 / np.sqrt(fan_in) / self.init_scale

        def u(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -s, s)

        return {"kernel_init": u, "bias_init": u}

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        y = nn.LayerNorm(name="norm", dtype=self.dtype)(x)
        y = nn.Dense(self.hidden_dim, name="fc1", dtype=self.dtype,
                     **self._inits(self.dim))(y)
        y = nn.gelu(y, approximate=False)
        if self.dropout > 0.0:
            y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        y = nn.Dense(self.out_dim or self.dim, name="fc2", dtype=self.dtype,
                     **self._inits(self.hidden_dim))(y)
        return y


class Transformer(nn.Module):
    """Pre-norm residual transformer (reference vit.py Transformer)."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: Array, valid: Array | None = None, deterministic: bool = True
    ) -> Array:
        for i in range(self.depth):
            x = x + MaskedAttention(
                self.dim, self.heads, self.dim_head, self.dropout,
                dtype=self.dtype, name=f"attn_{i}"
            )(x, valid, deterministic)
            x = x + FeedForward(self.dim, self.mlp_dim, self.dropout,
                                dtype=self.dtype, name=f"ff_{i}")(
                x, deterministic
            )
        return nn.LayerNorm(name="norm", dtype=self.dtype)(x)


def masked_mean(x: Array, valid: Array) -> Array:
    """Mean over the token axis restricted to valid tokens."""
    m = valid[..., None].astype(x.dtype)
    return jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
