"""ContextCast masked autoencoder over SST (reference MSFNO/Models/mae/maenet.py).

Used two ways, as in the reference:
  1. pretraining: reconstruct randomly-masked SST patches, predicting
     per-patch (mean, std) trained with NormalCRPS (mae/model.py);
  2. FiLM generation: the encoder class token feeds a FeedForward film head
     (Film_wrapper, sfnonet.py:879-889).

TPU-native reformulation of the dynamic parts:
- token count is static; NaN-dominated tokens are flagged invalid rather than
  dropped (maenet.py:304-336) and masked out of attention, reconstruction
  and the loss;
- random masking keeps a static M = int(N * (1 - mask_ratio)) tokens (floor,
  like the reference's int() cast) via a
  per-sample argsort of uniform noise (same construction as
  maenet.py:234-246), so every gather has a static shape.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from msfno_tpu.models.film.attention import (
    FeedForward,
    MaskedAttention,
    patchify,
    token_validity,
    unpatchify,
)

Array = jax.Array


class LayerScaled(nn.Module):
    """Residual wrapper with optional per-layer scale (maenet.py MHA/FFN)."""

    inner: nn.Module
    dim: int
    layer_scale: float | None = None

    @nn.compact
    def __call__(self, x, *args, **kwargs):
        y = self.inner(x, *args, **kwargs)
        if self.layer_scale is not None:
            g = self.param(
                "gamma",
                lambda k, s: jnp.full(s, self.layer_scale, jnp.float32),
                (self.dim,),
            )
            y = y * g
        return x + y


class ContextCast(nn.Module):
    """Masked autoencoder over (B, T, H, W) SST (reference ContextCast,
    maenet.py:78-271)."""

    patch_size: tuple[int, int, int] = (28, 9, 9)
    encoder_dim: int = 512
    decoder_dim: int = 512
    encoder_depth: int = 4
    decoder_depth: int = 2
    heads: int = 8
    dropout: float = 0.0
    predict_std: bool = True
    layer_scale: float | None = None
    nan_mask_threshold: float = 0.5

    @nn.compact
    def __call__(
        self,
        obs: Array,
        mask_ratio: float = 0.0,
        rng: Array | None = None,
        deterministic: bool = True,
    ):
        """Returns ((mean, std), (loss_mask, nan_elements), cls_encoder,
        cls_decoder); mean/std/masks are unpatchified to (B, T, H, W)."""
        if obs.ndim == 5:  # (B, C=1, T, H, W) -> (B, T, H, W)
            obs = obs[:, 0]
        b, t, h, w = obs.shape
        pt, ph, pw = self.patch_size
        pt = min(pt, t)
        tokens = patchify(obs, pt, ph, pw)
        n, pdim = tokens.shape[1], tokens.shape[2]
        nan_el, valid = token_validity(tokens, self.nan_mask_threshold)
        tokens = jnp.nan_to_num(tokens)

        # patch embedding (Transformer_patch_embedding, maenet.py:304-336)
        z = nn.LayerNorm(name="patch_norm1")(tokens)
        z = nn.Dense(self.encoder_dim, name="patch_proj")(z)
        z = nn.LayerNorm(name="patch_norm2")(z)

        enc_pos = self.param(
            "encoder_position_code",
            nn.initializers.normal(stddev=0.2),
            (n, self.encoder_dim),
        )
        dec_pos = self.param(
            "decoder_position_code",
            nn.initializers.normal(stddev=0.2),
            (n, self.decoder_dim),
        )
        cls_tok = self.param(
            "class_token", nn.initializers.normal(stddev=0.02), (1, self.encoder_dim)
        )
        mask_tok = self.param(
            "mask_token", nn.initializers.normal(stddev=0.02), (1, self.decoder_dim)
        )

        z = z + enc_pos[None]

        # random masking (maenet.py:234-246).  Two static-shape realizations:
        # - static Python mask_ratio: keep the first M of a random shuffle and
        #   gather (cheapest; M tokens through the encoder);
        # - traced mask_ratio (per-batch U(0.4, 0.8) sampled inside jit, the
        #   reference's train.py:334 semantics): the kept COUNT is data-
        #   dependent, so instead of gathering, all N tokens run through the
        #   encoder and masked tokens are excluded via the attention mask —
        #   numerically identical for every kept token and the class token
        #   (softmax never sees masked keys), verified in tests/test_models.py.
        if rng is None:
            # only legitimate with no masking (film-generator inference at
            # mask_ratio=0); a silent PRNGKey(0) fallback during pretraining
            # would freeze ONE mask pattern across every batch of every
            # epoch — the model overfits it without any warning
            if not (isinstance(mask_ratio, (float, int)) and mask_ratio == 0.0):
                raise ValueError(
                    "ContextCast: mask_ratio > 0 (or traced) requires an "
                    "explicit rng"
                )
            rng = jax.random.PRNGKey(0)  # unused: nothing is masked
        noise = jax.random.uniform(rng, (b, n))
        dynamic = not isinstance(mask_ratio, (float, int))
        if dynamic:
            m_keep = jnp.maximum(jnp.floor(n * (1.0 - mask_ratio)), 1.0)
            rank = jnp.argsort(jnp.argsort(noise, axis=1), axis=1)
            kept = rank < m_keep  # (B, N) bool, static shape
        else:
            m_keep = max(int(n * (1.0 - mask_ratio)), 1)
            shuffle = jnp.argsort(noise, axis=1)
            restore = jnp.argsort(shuffle, axis=1)
            keep_idcs = shuffle[:, :m_keep]
            kept = jnp.zeros((b, n), bool).at[
                jnp.arange(b)[:, None], keep_idcs
            ].set(True)
        loss_mask_tok = 1.0 - kept.astype(jnp.float32)  # 1 = scored

        take = lambda a, idx: jnp.take_along_axis(a, idx[..., None], axis=1)
        if dynamic:
            z_kept, valid_kept = z, valid & kept
        else:
            z_kept = take(z, keep_idcs)
            valid_kept = jnp.take_along_axis(valid, keep_idcs, axis=1)

        # encoder with class token
        z_enc = jnp.concatenate([jnp.broadcast_to(cls_tok[None], (b, 1, self.encoder_dim)), z_kept], axis=1)
        valid_enc = jnp.concatenate(
            [jnp.ones((b, 1), bool), valid_kept], axis=1
        )
        for i in range(self.encoder_depth):
            z_enc = LayerScaled(
                MaskedAttention(self.encoder_dim, self.heads, self.encoder_dim // self.heads, self.dropout),
                self.encoder_dim,
                self.layer_scale,
                name=f"enc_attn_{i}",
            )(z_enc, valid_enc, deterministic)
            z_enc = LayerScaled(
                FeedForward(self.encoder_dim, 4 * self.encoder_dim, self.dropout),
                self.encoder_dim,
                self.layer_scale,
                name=f"enc_ff_{i}",
            )(z_enc, deterministic)
        cls_encoder = z_enc[:, 0]

        # decoder: project, restore order with mask tokens, add position code
        y = nn.LayerNorm(name="dec_proj_norm")(z_enc)
        y = nn.Dense(self.decoder_dim, name="dec_proj")(y)
        cls_dec_in, y_kept = y[:, :1], y[:, 1:]
        if dynamic:
            y_full = jnp.where(
                kept[..., None],
                y_kept,
                jnp.broadcast_to(mask_tok[None], (b, n, self.decoder_dim)),
            ) + dec_pos[None]
        else:
            mask_fill = jnp.broadcast_to(
                mask_tok[None], (b, n - m_keep, self.decoder_dim)
            )
            y_full = jnp.concatenate([y_kept, mask_fill], axis=1)
            y_full = take(y_full, restore) + dec_pos[None]
        y_full = jnp.concatenate([cls_dec_in, y_full], axis=1)
        valid_dec = jnp.concatenate([jnp.ones((b, 1), bool), valid], axis=1)
        for i in range(self.decoder_depth):
            y_full = LayerScaled(
                MaskedAttention(self.decoder_dim, self.heads, self.decoder_dim // self.heads, self.dropout),
                self.decoder_dim,
                self.layer_scale,
                name=f"dec_attn_{i}",
            )(y_full, valid_dec, deterministic)
            y_full = LayerScaled(
                FeedForward(self.decoder_dim, 4 * self.decoder_dim, self.dropout),
                self.decoder_dim,
                self.layer_scale,
                name=f"dec_ff_{i}",
            )(y_full, deterministic)
        cls_decoder = y_full[:, 0]
        out_tok = y_full[:, 1:]

        to_img = lambda tok: unpatchify(
            tok, pt, ph, pw, t // pt, h // ph, w // pw
        )
        mean_tok = nn.Dense(
            pdim, name="to_mean", kernel_init=nn.initializers.xavier_uniform()
        )(nn.LayerNorm(name="to_mean_norm")(out_tok))
        mean = to_img(mean_tok)
        std = None
        if self.predict_std:
            std_tok = nn.Dense(
                pdim, name="to_std", kernel_init=nn.initializers.xavier_uniform()
            )(nn.LayerNorm(name="to_std_norm")(out_tok))
            std = to_img(std_tok)

        # loss masks as images: score only masked, valid, non-NaN elements
        score_tok = loss_mask_tok[..., None] * valid[..., None] * (~nan_el)
        loss_mask = to_img(jnp.broadcast_to(score_tok, (b, n, pdim)))
        nan_elements = to_img(
            jnp.broadcast_to((nan_el | ~valid[..., None]), (b, n, pdim))
        )
        return (mean, std), (loss_mask, nan_elements), cls_encoder, cls_decoder
