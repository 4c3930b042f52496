"""Model registry and high-level wrappers (reference L3 layer:
MSFNO/Models/models.py `Model`/`ATMModel`/`load_model` and the per-family
`get_model` muxes, e.g. sfno/model.py:1590-1598).

The wrapper owns assets (statistics, weights), normalizers, rollout and
training entry points — the "util" object the reference Trainer drives.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from msfno_tpu.data.normalization import Normalizer, SSTNormalizer
from msfno_tpu.inference.rollout import RolloutConfig, rollout
from msfno_tpu.models.sfno.sfnonet import (
    FourierNeuralOperatorNet,
    FourierNeuralOperatorNetFilmed,
)
from msfno_tpu.models.variables import ORDERING
from msfno_tpu.training import checkpoint as ckpt_io
from msfno_tpu.utils.config import FilmConfig, SFNOConfig, TrainConfig, to_json
from msfno_tpu.utils.observability import Stepper

log = logging.getLogger("msfno_tpu")


@dataclasses.dataclass
class ModelWrapper:
    """Base wrapper: config + params + normalizers + I/O
    (reference Model/ATMModel, models.py:49-401)."""

    cfg: SFNOConfig
    assets: str | None = None
    params: dict | None = None

    def __post_init__(self):
        self.module = self.build_module()
        self.normalizer = self.load_statistics()
        self.sst_normalizer = SSTNormalizer.identity()
        # FiLM modulation strength used at inference; load_model overwrites
        # it with the checkpoint's trained value when present
        self.film_scale = 1.0

    # ---- construction ------------------------------------------------
    def build_module(self):
        raise NotImplementedError

    def init_params(self, rng=None) -> dict:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        h, w = self.cfg.img_size
        x = jnp.zeros((1, h, w, self.cfg.in_chans))
        args = self._example_extra_args()
        self.params = self.module.init(rng, x, *args)["params"]
        return self.params

    def _example_extra_args(self) -> tuple:
        return ()

    # ---- assets ------------------------------------------------------
    def load_statistics(self) -> Normalizer:
        """global_means.npy / global_stds.npy (reference model.py:194-205)."""
        if self.assets:
            m = os.path.join(self.assets, "global_means.npy")
            s = os.path.join(self.assets, "global_stds.npy")
            if os.path.exists(m) and os.path.exists(s):
                return Normalizer.from_npy(m, s)
        return Normalizer.identity(self.cfg.in_chans)

    def normalise(self, x, reverse: bool = False):
        return self.normalizer(x, reverse=reverse)

    def load_model(self, checkpoint_file: str | None) -> dict:
        """Load params from a native .npz checkpoint or a reference torch
        checkpoint (weights.tar / .pkl), converting names and layouts
        (reference load_model, model.py:207-271)."""
        if checkpoint_file is None:
            return self.init_params()
        from msfno_tpu.models.convert import is_torch_checkpoint

        if is_torch_checkpoint(checkpoint_file):
            from msfno_tpu.models.convert import load_ecmwf_weights_tar

            result = load_ecmwf_weights_tar(
                checkpoint_file, num_layers=self.cfg.num_layers
            )
            if result["unconverted"]:
                log.warning(
                    "unconverted checkpoint keys (strict=False semantics): %s",
                    result["unconverted"][:10],
                )
            converted = result["params"]
            if self.params is None:
                self.init_params()
            # overlay converted weights on the initialized tree
            self.params = ckpt_io.merge_film_checkpoint(self.params, converted)
        else:
            self.params, _, meta = ckpt_io.load_checkpoint(checkpoint_file)
            # inference must modulate at the TRAINED film strength: the ramp
            # leaves film_scale well below 1.0 in most checkpoints, and
            # running at 1.0 would apply FiLM at many times its trained
            # magnitude (eval_checkpoints.py reads the same meta key)
            if "film_scale" in meta:
                self.film_scale = float(meta["film_scale"])
        return self.params

    def save_checkpoint(self, path: str, **extra):
        ckpt_io.save_checkpoint(
            path, self.params, config_json=to_json(self.cfg), **extra
        )

    # ---- inference / training ---------------------------------------
    def running(
        self,
        x0: np.ndarray,
        lead_time_h: int = 24,
        sst_seq: np.ndarray | None = None,
        collect_channels: Sequence[int] | None = None,
        output=None,
        mesh=None,
    ):
        """Autoregressive forecast (reference running(), model.py:289-372).
        Yields denormalized fields per 6h step; optionally writes each step
        to an `output` (see msfno_tpu/inference/outputs.py).  With a mesh the
        rollout runs SPMD (sharded params + lat-sharded SHT)."""
        steps = lead_time_h // 6
        stepper = Stepper(steps)
        filmed = isinstance(self.module, FourierNeuralOperatorNetFilmed)
        it = rollout(
            self.module,
            self.params,
            x0,
            RolloutConfig(steps=steps, collect_channels=collect_channels),
            sst_seq=sst_seq if filmed else None,
            scale=self.film_scale,
            normalizer=self.normalizer,
            sst_normalizer=self.sst_normalizer,
            stepper=stepper,
            mesh=mesh,
        )
        for i, field in enumerate(it):
            if output is not None:
                output.write(field, step=(i + 1) * 6)
            yield field

    def trainer(self, tcfg: TrainConfig, **kw):
        from msfno_tpu.training.trainer import Trainer

        return Trainer(
            self.cfg,
            tcfg,
            normalizer=self.normalizer,
            sst_normalizer=self.sst_normalizer,
            **kw,
        )

    def get_parameters(self):
        """Trainable parameter subset (reference get_parameters,
        model.py:1532-1536: film params only for the filmed model)."""
        return self.params


class SFNOWrapper(ModelWrapper):
    """FourCastNetv2 (reference sfno/model.py:36-903)."""

    def build_module(self):
        return FourierNeuralOperatorNet(self.cfg)

    @property
    def ordering(self):
        return ORDERING


class SFNOFilmedWrapper(ModelWrapper):
    """FourCastNetv2_filmed (reference sfno/model.py:905-1588)."""

    def build_module(self):
        if self.cfg.film is None:
            raise ValueError("film config required")
        return FourierNeuralOperatorNetFilmed(self.cfg)

    def _example_extra_args(self):
        f = self.cfg.film
        return (jnp.zeros((1, f.temporal_step, *f.sst_shape)),)

    def get_parameters(self):
        from msfno_tpu.training.partition import (
            film_trainable_predicate,
            split_params,
        )

        pred = film_trainable_predicate(num_layers=self.cfg.num_layers)
        trainable, _ = split_params(self.params, pred)
        return trainable


def get_model(
    model_type: str = "sfno",
    model_version: str = "latest",
    cfg: SFNOConfig | None = None,
    **kw,
) -> ModelWrapper:
    """Registry mux (reference load_model, models.py:418-428 + per-family
    get_model, sfno/model.py:1590-1598; variants SURVEY.md section 2.5)."""
    if model_type == "sfno":
        if model_version == "film":
            cfg = cfg or SFNOConfig(film=FilmConfig())
            return SFNOFilmedWrapper(cfg, **kw)
        cfg = cfg or SFNOConfig()
        return SFNOWrapper(cfg, **kw)
    if model_type == "fcn":
        from msfno_tpu.models.registry_fcn import FCNWrapper

        return FCNWrapper.for_version(model_version, cfg, **kw)
    if model_type == "mae":
        from msfno_tpu.models.registry_mae import MAEWrapper, LinProbeWrapper

        if model_version == "lin-probe":
            return LinProbeWrapper(cfg or SFNOConfig(film=FilmConfig()), **kw)
        return MAEWrapper(cfg or SFNOConfig(film=FilmConfig()), **kw)
    raise ValueError(f"unknown model {model_type}/{model_version}")
