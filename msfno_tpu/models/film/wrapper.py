"""FiLM generator mux (reference Film_wrapper, sfnonet.py:863-912).

Selects the generator by film_gen_type and reshapes its output to
(B, 2, film_layers, num_film_features): gamma = [:, 0], beta = [:, 1].
For the "mae" generator, the (frozen) ContextCast encoder class token is fed
through a trainable FeedForward film head, as in the reference
(sfnonet.py:879-889, 900-912).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from msfno_tpu.models.film.attention import FeedForward
from msfno_tpu.models.film.gcn import GCNFilmGenerator
from msfno_tpu.models.film.mae import ContextCast
from msfno_tpu.models.film.vit import ViTFilmGenerator
from msfno_tpu.utils.config import FilmConfig

Array = jax.Array


class FilmWrapper(nn.Module):
    cfg: FilmConfig

    @nn.compact
    def __call__(self, sst: Array, deterministic: bool = True) -> Array:
        cfg = self.cfg
        out = cfg.num_film_features * cfg.film_layers * 2
        kind = cfg.film_gen_type
        dtype = jnp.dtype(cfg.compute_dtype)
        if kind == "gcn":
            x = GCNFilmGenerator(
                out, cfg.embed_dim, cfg.model_depth, custom=False, dtype=dtype,
                use_pallas=cfg.pallas_gcn, name="film_gen",
            )(sst, deterministic)
        elif kind == "transformer":
            x = ViTFilmGenerator(
                out,
                patch_size=cfg.patch_size,
                dim=cfg.embed_dim,
                depth=cfg.model_depth,
                mlp_dim=cfg.mlp_dim,
                nan_mask_threshold=cfg.nan_mask_threshold,
                dropout=cfg.dropout,
                dtype=dtype,
                name="film_gen",
            )(sst, deterministic)
        elif kind == "mae" and cfg.cls_input:
            # sst is a precomputed cls token (B, embed_dim)
            x = FeedForward(
                cfg.embed_dim,
                cfg.mlp_dim,
                cfg.dropout,
                out_dim=out,
                init_scale=cfg.scale_weight,
                name="film_head",
            )(sst, deterministic)
            return x.reshape(sst.shape[0], 2, cfg.film_layers,
                             cfg.num_film_features)
        elif kind == "mae":
            # NOTE: cfg.model_depth is intentionally NOT wired here — the
            # reference's Film_wrapper likewise builds its ContextCast with
            # the class defaults encoder_depth=4 / decoder_depth=2 / heads=8
            # (sfnonet.py:878, maenet.py:89-90); model_depth only drives the
            # gcn/transformer generators in both codebases
            (_, _), (_, _), cls_enc, _ = ContextCast(
                patch_size=cfg.patch_size,
                encoder_dim=cfg.embed_dim,
                decoder_dim=cfg.embed_dim,
                nan_mask_threshold=cfg.nan_mask_threshold,
                dropout=cfg.dropout,
                name="film_gen",
            )(sst, mask_ratio=0.0, deterministic=deterministic)
            x = FeedForward(
                cfg.embed_dim,
                cfg.mlp_dim,
                cfg.dropout,
                out_dim=out,
                init_scale=cfg.scale_weight,
                name="film_head",
            )(cls_enc, deterministic)
        elif kind in ("gcn_custom", "none", None):
            # "none"/None mean "no generator requested": the reference maps
            # them to the gcn_custom default (main.py:130-134)
            x = GCNFilmGenerator(
                out, cfg.embed_dim, cfg.model_depth, custom=True, dtype=dtype,
                use_pallas=cfg.pallas_gcn, name="film_gen",
            )(sst, deterministic)
        else:
            raise ValueError(
                f"unknown film_gen_type {kind!r}; expected gcn, gcn_custom, "
                "transformer, mae, or none"
            )
        return x.reshape(sst.shape[0], 2, cfg.film_layers, cfg.num_film_features)
