"""Skill evaluation vs climatology (reference evaluate_model,
MSFNO/Models/sfno/model.py:1292-1486; protocol: skill = 1 - MSE_model /
MSE_climatology per variable per lead, model.py:1419-1422;
Skill_SFNO_vs_FCN.ipynb cell 13)."""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class SkillReport:
    """Per-(lead step, variable) arrays."""

    mse_model: np.ndarray  # (S, C) in real space
    mse_model_norm: np.ndarray  # (S, C) in normalized space
    mse_climatology: np.ndarray  # (S, C)
    skill: np.ndarray  # (S, C) = 1 - mse_model / mse_climatology

    def save(self, path_prefix: str):
        np.save(path_prefix + "_mse_model.npy", self.mse_model)
        np.save(path_prefix + "_mse_model_norm.npy", self.mse_model_norm)
        np.save(path_prefix + "_mse_climatology.npy", self.mse_climatology)
        np.save(path_prefix + "_skill.npy", self.skill)


def lat_weights(h: int) -> np.ndarray:
    """Cos-lat area weights for spatial means (poles included)."""
    w = np.cos(np.linspace(-np.pi / 2, np.pi / 2, h))
    w = np.clip(w, 0.0, None) + 1e-6
    return (w / w.mean()).astype(np.float32)[:, None, None]


def weighted_mse(pred: np.ndarray, target: np.ndarray) -> np.ndarray:
    """(B, H, W, C) -> per-variable (C,) cos-lat-weighted MSE."""
    w = lat_weights(pred.shape[-3])
    return np.mean(((pred - target) ** 2) * w, axis=(0, 1, 2))


def evaluate_rollout(
    forecasts: np.ndarray,
    targets: np.ndarray,
    climatology: np.ndarray,
    forecasts_norm: np.ndarray | None = None,
    targets_norm: np.ndarray | None = None,
) -> SkillReport:
    """forecasts/targets: (S, B, H, W, C) real space; climatology broadcastable
    to targets (per step or static)."""
    s = forecasts.shape[0]
    mse_model = np.stack([weighted_mse(forecasts[k], targets[k]) for k in range(s)])
    clim = np.broadcast_to(climatology, targets.shape)
    mse_clim = np.stack([weighted_mse(clim[k], targets[k]) for k in range(s)])
    if forecasts_norm is not None and targets_norm is not None:
        mse_norm = np.stack(
            [weighted_mse(forecasts_norm[k], targets_norm[k]) for k in range(s)]
        )
    else:
        mse_norm = np.full_like(mse_model, np.nan)
    skill = 1.0 - mse_model / np.maximum(mse_clim, 1e-12)
    return SkillReport(mse_model, mse_norm, mse_clim, skill)


def hourly_climatology(fields: np.ndarray, day_of_year: np.ndarray,
                       hour: np.ndarray, n_doy: int = 366, n_hour: int = 4):
    """Build a (day-of-year, hour)-indexed climatology from a field archive
    (reference indexes weatherbench 1990-2019 climatology by (dayofyear,
    hour), model.py:1331-1416).  fields: (N, H, W, C)."""
    h6 = (hour // 6).astype(int)
    out = np.zeros((n_doy, n_hour) + fields.shape[1:], dtype=np.float64)
    cnt = np.zeros((n_doy, n_hour), dtype=np.int64)
    for i in range(fields.shape[0]):
        out[day_of_year[i] - 1, h6[i]] += fields[i]
        cnt[day_of_year[i] - 1, h6[i]] += 1
    # empty (doy, hour) bins fall back to the all-time mean field: an
    # all-zero climatology would make mse_clim the target's raw magnitude
    # and silently INFLATE the skill score for those leads
    empty = cnt == 0
    if empty.any():
        import logging

        logging.getLogger("msfno_tpu").warning(
            "climatology: %d of %d (doy, hour) bins have no samples; "
            "filling with the archive mean", int(empty.sum()), empty.size,
        )
        out[empty] = fields.mean(axis=0, dtype=np.float64)
        cnt = np.where(empty, 1, cnt)
    return (out / cnt[..., None, None, None]).astype(np.float32)
