"""Offline climatology builder (reference data_process/climatology.py:55-106).

Iterative mean over years at fixed (day-of-year, hour) slots, leap-day
dropped, so memory stays O(one year) regardless of archive length.  Operates
on any backend exposing era5(idx) -> (H, W, C) with 6-hourly indexing.
"""

from __future__ import annotations

import numpy as np

from msfno_tpu.data.era5 import STEPS_PER_DAY
from calendar import isleap


def build_climatology(
    backend,
    dataset_start_year: int,
    years: list[int],
    out_path: str | None = None,
) -> np.ndarray:
    """Mean state per (day-of-year 1..365, hour slot 0..3) over `years`.

    Returns (365, 4, H, W, C) float32.  Feb 29 is dropped (reference
    climatology.py:74-79).
    """
    sample = backend.era5(0)
    clim = np.zeros((365, STEPS_PER_DAY) + sample.shape, dtype=np.float64)
    count = 0

    # a 30-year build touches ~44k files; route through the backend's
    # threaded bulk reader when it has one instead of serial single reads
    batch_read = getattr(backend, "era5_batch", None)
    chunk_days = 8  # 32 files per bulk read keeps memory O(chunk)

    for year in years:
        # index of Jan 1 of `year`
        base = STEPS_PER_DAY * sum(
            366 if isleap(y) else 365 for y in range(dataset_start_year, year)
        )
        # (store index, target day-of-year slot) for every kept step
        pairs = []
        idx = base
        for doy in range(366 if isleap(year) else 365):
            target_doy = doy
            if isleap(year):
                if doy == 59:  # Feb 29: skip
                    idx += STEPS_PER_DAY
                    continue
                if doy > 59:
                    target_doy = doy - 1
            for h in range(STEPS_PER_DAY):
                pairs.append((idx, target_doy, h))
                idx += 1
        step = chunk_days * STEPS_PER_DAY
        for c in range(0, len(pairs), step):
            part = pairs[c : c + step]
            if batch_read is not None:
                fields = batch_read([p[0] for p in part])
            else:
                fields = [backend.era5(p[0]) for p in part]
            for (_, target_doy, h), field in zip(part, fields):
                clim[target_doy, h] += field
        count += 1

    clim = (clim / max(count, 1)).astype(np.float32)
    if out_path:
        np.save(out_path, clim)
    return clim


def climatology_at(clim: np.ndarray, day_of_year: int, hour: int,
                   leap_year: bool = False) -> np.ndarray:
    """Lookup with Feb-29 mapped to Feb-28 (reference eval indexing,
    sfno/model.py:1331-1416).

    The 365-slot array is built leap-day-DROPPED: slot 59 is Mar 1.  In a
    leap year, day_of_year 60 is Feb 29 (mapped to the Feb-28 slot 58) and
    every later day_of_year is one AHEAD of its slot — without the shift,
    Mar 1..Dec 30 of a leap year would silently read the next day's
    climatology."""
    doy = day_of_year - 1
    if leap_year:
        if doy == 59:  # Feb 29
            doy = 58
        elif doy > 59:
            doy -= 1
    doy = min(doy, 364)
    return clim[doy, (hour // 6) % STEPS_PER_DAY]
