"""SST dataset helpers (reference SST_galvani, MSFNO/Models/data.py:233-397).

The zarr-backed dataset is gated on xarray/zarr availability (absent in this
image); the numerical pieces — coarsening, the ONI (Oceanic Nino Index)
computation over the Nino-3.4 box vs a day-of-year climatology
(data.py:331-369) — are pure numpy and always available.
"""

from __future__ import annotations

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
    with np.errstate(invalid="ignore"):
        return np.nanmean(x, axis=(-3, -1))


def nino34_mask(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """(H, W) bool mask of the Nino-3.4 box."""
    la = (lat >= NINO34_LAT[0]) & (lat <= NINO34_LAT[1])
    lo = (lon >= NINO34_LON[0]) & (lon <= NINO34_LON[1])
    return la[:, None] & lo[None, :]


def compute_oni(
    sst: np.ndarray,
    day_of_year: np.ndarray,
    lat: np.ndarray,
    lon: np.ndarray,
    smooth_days: int = 90,
) -> np.ndarray:
    """ONI: Nino-3.4 SST anomaly vs day-of-year climatology, smoothed
    (reference data.py:331-369 computes the anomaly against a
    day-of-year climatology and applies a 3-month running mean).

    sst: (N, H, W) with NaN over land; day_of_year: (N,) in 1..366.
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
    # running mean over ~3 months
    k = max(smooth_days, 1)
    kernel = np.ones(k) / k
    pad = np.pad(anom, (k // 2, k - 1 - k // 2), mode="edge")
    return np.convolve(pad, kernel, mode="valid").astype(np.float32)
