"""FourCastNet (AFNO) wrappers (reference MSFNO/Models/fourcastnet/model.py).

Variants (SURVEY.md section 2.5):
  fcn 0 / release -> FourCastNet0, 20 channels (model.py:255-296)
  fcn 1 / latest  -> FourCastNet1, 26 channels (model.py:298-346)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from msfno_tpu.models.afno.afnonet import AFNONet
from msfno_tpu.models.registry import ModelWrapper
from msfno_tpu.utils.config import SFNOConfig

FCN0_SFC = ["10u", "10v", "2t", "sp", "msl", "tcwv"]
FCN0_PL = (["t", "u", "v", "z", "r"], [1000, 850, 500, 50])
# 20-channel ordering (model.py:266-294)
FCN0_ORDERING = [
    "10u", "10v", "2t", "sp", "msl", "tcwv",
    "t850", "t500", "u1000", "u850", "u500", "v1000", "v850", "v500",
    "z1000", "z850", "z500", "z50", "r850", "r500",
]

FCN1_SFC = ["10u", "10v", "2t", "sp", "msl", "tcwv", "100u", "100v"]
FCN1_PL = (["t", "u", "v", "z", "r"], [1000, 850, 500, 250, 50])
FCN1_ORDERING = FCN1_SFC + [
    f"{p}{lev}" for p in FCN1_PL[0] for lev in FCN1_PL[1]
][: 26 - len(FCN1_SFC)]


def fcn_config(channels: int) -> SFNOConfig:
    """Shoehorn the AFNO dims into the shared config container."""
    return SFNOConfig(
        img_size=(720, 1440),
        scale_factor=8,  # patch size
        in_chans=channels,
        out_chans=channels,
        embed_dim=768,
        num_layers=12,
        spectral_transform="fft",
        film=None,
    )


class FCNWrapper(ModelWrapper):
    ordering: list[str] = FCN1_ORDERING

    def build_module(self):
        c = self.cfg
        return AFNONet(
            img_size=c.img_size,
            patch_size=(c.scale_factor, c.scale_factor),
            in_chans=c.in_chans,
            out_chans=c.out_chans,
            embed_dim=c.embed_dim,
            depth=c.num_layers,
        )

    def load_model(self, checkpoint_file: str | None) -> dict:
        """Load native .npz checkpoints or reference FourCastNet torch
        checkpoints (AFNO layout converter, reference
        fourcastnet/model.py weight loading)."""
        if checkpoint_file is None:
            return self.init_params()
        if checkpoint_file.endswith((".tar", ".pkl", ".pt", ".ckpt")):
            import logging

            from msfno_tpu.models.convert import convert_afno_state_dict
            from msfno_tpu.models.torch_reader import (
                load_torch_checkpoint,
                state_dict_arrays,
            )
            from msfno_tpu.training import checkpoint as ckpt_io

            checkpoint = load_torch_checkpoint(checkpoint_file)
            weights = (
                checkpoint.get("model_state", checkpoint)
                if isinstance(checkpoint, dict)
                else checkpoint
            )
            c = self.cfg
            result = convert_afno_state_dict(
                state_dict_arrays(weights),
                img_size=c.img_size,
                patch_size=(c.scale_factor, c.scale_factor),
            )
            if result["unconverted"]:
                logging.getLogger("msfno_tpu").warning(
                    "unconverted afno keys: %s", result["unconverted"][:10]
                )
            if self.params is None:
                self.init_params()
            self.params = ckpt_io.merge_film_checkpoint(
                self.params, result["params"]
            )
            return self.params
        return super().load_model(checkpoint_file)

    @classmethod
    def for_version(cls, version: str, cfg: SFNOConfig | None = None, **kw):
        if version in ("0", "release"):
            w = cls(cfg or fcn_config(20), **kw)
            w.ordering = FCN0_ORDERING
            return w
        w = cls(cfg or fcn_config(26), **kw)
        w.ordering = FCN1_ORDERING
        return w
