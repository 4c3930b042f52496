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
# 20-channel ordering EXACTLY as the reference lists it (model.py:266-287):
# NOT sfc-then-pl — t850 sits at index 5, tcwv at 19, r500 before r850
FCN0_ORDERING = [
    "10u", "10v", "2t", "sp", "msl", "t850",
    "u1000", "v1000", "z1000", "u850", "v850", "z850",
    "u500", "v500", "z500", "t500", "z50", "r500", "r850", "tcwv",
]

FCN1_SFC = ["10u", "10v", "2t", "sp", "msl", "tcwv", "100u", "100v"]
FCN1_PL = (["t", "u", "v", "z", "r"], [1000, 850, 500, 250, 50])
# 26-channel ordering = FCN0's 20 + the v0.1 additions, verbatim from
# model.py:309-336 (100u/100v then the 250 hPa levels)
FCN1_ORDERING = FCN0_ORDERING + ["100u", "100v", "u250", "v250", "z250", "t250"]


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
