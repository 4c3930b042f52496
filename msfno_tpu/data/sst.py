"""SST dataset helpers (reference SST_galvani, MSFNO/Models/data.py:233-397).

The zarr-backed dataset is gated on xarray/zarr availability (absent in this
image); the numerical pieces — coarsening, the ONI (Oceanic Nino Index)
computation over the Nino-3.4 box vs a day-of-year climatology
(data.py:331-369) — are pure numpy and always available.
"""

from __future__ import annotations

import os
import warnings

import numpy as np

# Nino-3.4 box: 5S-5N, 170W-120W
NINO34_LAT = (-5.0, 5.0)
NINO34_LON = (190.0, 240.0)


def coarsen(field: np.ndarray, factor: int) -> np.ndarray:
    """Mean-pool (…, H, W) by `factor` (reference 4x coarsening of the
    0.25-degree SST to 1 degree, data.py:198-213).  NaN-aware: a cell is NaN
    only if all contributing pixels are NaN."""
    h, w = field.shape[-2:]
    h2, w2 = h // factor, w // factor
    x = field[..., : h2 * factor, : w2 * factor]
    x = x.reshape(*x.shape[:-2], h2, factor, w2, factor)
    # all-NaN cells (land) are the expected output NaNs; silence numpy's
    # "Mean of empty slice" RuntimeWarning for them (warnings-module based,
    # so errstate alone does not cover it)
    with np.errstate(invalid="ignore"), warnings.catch_warnings():
        warnings.filterwarnings(
            "ignore", message="Mean of empty slice", category=RuntimeWarning
        )
        return np.nanmean(x, axis=(-3, -1))


def nino34_mask(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """(H, W) bool mask of the Nino-3.4 box."""
    la = (lat >= NINO34_LAT[0]) & (lat <= NINO34_LAT[1])
    lo = (lon >= NINO34_LON[0]) & (lon <= NINO34_LON[1])
    return la[:, None] & lo[None, :]


class SSTNpyStore:
    """SST-only npy store → (T, H, W) history windows for MAE pretraining.

    Layout: {root}/sst_{idx:06d}.npy, one (H, W) frame (NaN over land) per
    6h step — the SST half of the combined era5+sst store, standing alone.
    The reference's MAE pretraining dataset (SST_galvani, data.py:233-397)
    likewise serves SST sequences without any ERA5 fields; wrapping the
    full ERA5Dataset for this would (a) demand era5_*.npy files a pure-SST
    store does not have and (b) read S*B full-resolution 73-channel states
    per batch only to discard them."""

    def __init__(self, root: str, temporal_step: int = 28):
        import re

        self.root = root
        self.temporal_step = temporal_step
        # only exact frame files count — a stray sst_mean.npy or *.tmp would
        # inflate n and window() would FileNotFoundError mid-training; the
        # contiguity check moves any gap to construction time
        idcs = sorted(
            int(m.group(1))
            for f in os.listdir(root)
            if (m := re.fullmatch(r"sst_(\d{6})\.npy", f))
        )
        self.n = len(idcs)
        if idcs and idcs != list(range(idcs[0], idcs[0] + len(idcs))):
            missing = sorted(set(range(idcs[0], idcs[-1] + 1)) - set(idcs))
            raise FileNotFoundError(
                f"sst_*.npy indices not contiguous under {root}: "
                f"missing {missing[:5]}{'...' if len(missing) > 5 else ''}"
            )
        if idcs and idcs[0] != 0:
            raise FileNotFoundError(
                f"sst_*.npy indices must start at 0, found {idcs[0]} under "
                f"{root}"
            )
        if self.n < temporal_step:
            raise FileNotFoundError(
                f"need >= {temporal_step} sst_*.npy frames under {root}, "
                f"found {self.n}"
            )

    def __len__(self) -> int:
        return self.n - self.temporal_step + 1

    def window(self, idx: int) -> np.ndarray:
        """(T, H, W) frames idx .. idx+T-1."""
        return np.stack(
            [
                np.load(os.path.join(self.root, f"sst_{idx + k:06d}.npy"))
                for k in range(self.temporal_step)
            ]
        )

    def batches(self, batch_size: int, epochs: int = 1, seed: int = 0,
                shuffle: bool = True):
        """Yields (B, T, H, W) float32 batches; per-epoch deterministic
        reshuffle, trailing partial batches dropped."""
        for epoch in range(epochs):
            order = np.arange(len(self))
            if shuffle:
                np.random.default_rng(seed + epoch).shuffle(order)
            for b in range(len(order) // batch_size):
                idcs = order[b * batch_size : (b + 1) * batch_size]
                yield np.stack([self.window(int(i)) for i in idcs]).astype(
                    np.float32
                )


def compute_oni(
    sst: np.ndarray,
    day_of_year: np.ndarray,
    lat: np.ndarray,
    lon: np.ndarray,
    smooth_days: int = 90,
    samples_per_day: int = 1,
) -> np.ndarray:
    """ONI: Nino-3.4 SST anomaly vs day-of-year climatology, smoothed
    (reference data.py:331-369 computes the anomaly against a
    day-of-year climatology and applies a 3-month running mean).

    sst: (N, H, W) with NaN over land; day_of_year: (N,) in 1..366.
    samples_per_day scales the smoothing window to the series cadence
    (pass 4 for a 6-hourly series so smooth_days means actual days).
    """
    box = nino34_mask(lat, lon)
    with np.errstate(invalid="ignore"):
        series = np.asarray(
            [np.nanmean(s[box]) for s in sst], dtype=np.float64
        )
    # day-of-year climatology
    clim = np.zeros(367)
    cnt = np.zeros(367)
    for v, d in zip(series, day_of_year):
        if np.isfinite(v):
            clim[d] += v
            cnt[d] += 1
    clim = clim / np.maximum(cnt, 1)
    anom = series - clim[day_of_year]
    # running mean over ~3 months of actual time
    k = max(smooth_days * samples_per_day, 1)
    kernel = np.ones(k) / k
    pad = np.pad(anom, (k // 2, k - 1 - k // 2), mode="edge")
    return np.convolve(pad, kernel, mode="valid").astype(np.float32)
