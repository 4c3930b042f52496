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
    # anomaly correlation coefficient vs the same climatology (S, C) —
    # the standard deterministic-verification metric (WMO/ECMWF practice);
    # the reference computes MSE/skill only, this is additional
    acc: np.ndarray | None = None

    def save(self, path_prefix: str):
        np.save(path_prefix + "_mse_model.npy", self.mse_model)
        np.save(path_prefix + "_mse_model_norm.npy", self.mse_model_norm)
        np.save(path_prefix + "_mse_climatology.npy", self.mse_climatology)
        np.save(path_prefix + "_skill.npy", self.skill)
        if self.acc is not None:
            np.save(path_prefix + "_acc.npy", self.acc)


def lat_weights(h: int) -> np.ndarray:
    """Cos-lat area weights for spatial means (poles included)."""
    w = np.cos(np.linspace(-np.pi / 2, np.pi / 2, h))
    w = np.clip(w, 0.0, None) + 1e-6
    return (w / w.mean()).astype(np.float32)[:, None, None]


def weighted_mse(pred: np.ndarray, target: np.ndarray) -> np.ndarray:
    """(B, H, W, C) -> per-variable (C,) cos-lat-weighted MSE."""
    w = lat_weights(pred.shape[-3])
    return np.mean(((pred - target) ** 2) * w, axis=(0, 1, 2))


def weighted_acc(pred: np.ndarray, target: np.ndarray,
                 clim: np.ndarray) -> np.ndarray:
    """(B, H, W, C) -> per-variable (C,) cos-lat-weighted anomaly
    correlation coefficient:
      ACC = <f' t'> / sqrt(<f'^2> <t'^2>),  f' = f - clim, t' = t - clim,
    with <.> the area-weighted mean over batch and grid (ECMWF
    deterministic-verification definition)."""
    w = lat_weights(pred.shape[-3])
    fp = pred - clim
    tp = target - clim
    num = np.sum(fp * tp * w, axis=(0, 1, 2))
    den = np.sqrt(
        np.sum(fp * fp * w, axis=(0, 1, 2))
        * np.sum(tp * tp * w, axis=(0, 1, 2))
    )
    return num / np.maximum(den, 1e-12)


def indexed_climatology(
    clim: np.ndarray, times: np.ndarray, target_shape: tuple
) -> np.ndarray:
    """Expand a (doy, hour)-binned climatology — the shape build_climatology
    (365, 4, H, W, C) and hourly_climatology (366, 4, ...) produce — to the
    per-target (S, B, H, W, C) array by looking up each target's valid time.

    times: (S, B) int YYYYMMDDHH; entries <= 0 (synthetic data carries 0)
    fall back to the all-slot mean field."""
    import datetime
    from calendar import isleap

    from msfno_tpu.data.climatology import climatology_at

    s, b = times.shape
    out = np.empty(target_shape, dtype=clim.dtype)
    mean_field = clim.mean(axis=(0, 1))
    leap_dropped = clim.shape[0] == 365
    for i in range(s):
        for j in range(b):
            t = int(times[i, j])
            if t <= 0:
                out[i, j] = mean_field
                continue
            y, mo, d, h = t // 10**6, t // 10**4 % 100, t // 100 % 100, t % 100
            doy = datetime.date(y, mo, d).timetuple().tm_yday
            if leap_dropped:
                out[i, j] = climatology_at(clim, doy, h, leap_year=isleap(y))
            else:  # 366-slot array indexes day-of-year directly
                out[i, j] = clim[doy - 1, (h // 6) % clim.shape[1]]
    return out


def evaluate_rollout(
    forecasts: np.ndarray,
    targets: np.ndarray,
    climatology: np.ndarray,
    forecasts_norm: np.ndarray | None = None,
    targets_norm: np.ndarray | None = None,
    times: np.ndarray | None = None,
) -> SkillReport:
    """forecasts/targets: (S, B, H, W, C) real space; climatology either
    broadcastable to targets (per step or static) or (doy, hour)-binned
    ((365|366, 4, H, W, C) — build_climatology/hourly_climatology output),
    in which case `times` ((S, B) YYYYMMDDHH valid times) selects the slot
    per target (reference eval indexing, sfno/model.py:1331-1416)."""
    s = forecasts.shape[0]
    mse_model = np.stack([weighted_mse(forecasts[k], targets[k]) for k in range(s)])
    binned = (
        climatology.ndim == targets.ndim
        and climatology.shape[0] in (365, 366)
        and climatology.shape[:2] != targets.shape[:2]
        and climatology.shape[2:] == targets.shape[2:]
    )
    if binned:
        if times is None:
            raise ValueError(
                "a (doy, hour)-binned climatology needs `times` to index; "
                "pass Batch.times or pre-select the slots"
            )
        clim = indexed_climatology(climatology, times, targets.shape)
    else:
        clim = np.broadcast_to(climatology, targets.shape)
    mse_clim = np.stack([weighted_mse(clim[k], targets[k]) for k in range(s)])
    if forecasts_norm is not None and targets_norm is not None:
        mse_norm = np.stack(
            [weighted_mse(forecasts_norm[k], targets_norm[k]) for k in range(s)]
        )
    else:
        mse_norm = np.full_like(mse_model, np.nan)
    skill = 1.0 - mse_model / np.maximum(mse_clim, 1e-12)
    acc = np.stack(
        [weighted_acc(forecasts[k], targets[k], clim[k]) for k in range(s)]
    )
    return SkillReport(mse_model, mse_norm, mse_clim, skill, acc=acc)


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
