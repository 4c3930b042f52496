"""ViT FiLM generator (reference MSFNO/Models/vit/vit.py:163-258).

3D-patchifies the coarse SST history (B, T, H, W), embeds patches, applies a
pre-norm transformer, mean-pools, and maps through a zero-initialized film
head.  The reference drops NaN-heavy tokens dynamically; here the token count
is static and invalid tokens are excluded by attention masking + masked
pooling (see attention.py docstring).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from msfno_tpu.models.film.attention import (
    Transformer,
    masked_mean,
    patchify,
    token_validity,
)

Array = jax.Array


class ViTFilmGenerator(nn.Module):
    out_features: int
    patch_size: tuple[int, int, int] = (28, 9, 9)
    dim: int = 512
    depth: int = 6
    heads: int = 16
    dim_head: int = 64
    mlp_dim: int = 512
    nan_mask_threshold: float = 0.5
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32  # computation dtype; params stay fp32

    @nn.compact
    def __call__(self, sst: Array, deterministic: bool = True) -> Array:
        if sst.ndim == 3:
            sst = sst[:, None]
        b, t, h, w = sst.shape
        pt, ph, pw = self.patch_size
        pt = min(pt, t)
        if t % pt or h % ph or w % pw:
            raise ValueError(
                f"SST shape {(t, h, w)} not divisible by patch {(pt, ph, pw)}"
            )
        tokens = patchify(sst, pt, ph, pw)
        _, valid = token_validity(tokens, self.nan_mask_threshold)
        tokens = jnp.nan_to_num(tokens)

        x = nn.LayerNorm(name="patch_norm1", dtype=self.dtype)(tokens)
        x = nn.Dense(self.dim, name="patch_proj", dtype=self.dtype)(x)
        x = nn.LayerNorm(name="patch_norm2", dtype=self.dtype)(x)

        n = tokens.shape[1]
        pos = self.param(
            "encoder_position_code",
            nn.initializers.normal(stddev=0.2),
            (n, self.dim),
        )
        x = x + pos[None]
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)

        x = Transformer(
            self.dim,
            self.depth,
            self.heads,
            self.dim_head,
            self.mlp_dim,
            self.dropout,
            dtype=self.dtype,
            name="transformer",
        )(x, valid, deterministic)

        pooled = masked_mean(x, valid)
        return nn.Dense(
            self.out_features,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="head_film",
        )(pooled)
