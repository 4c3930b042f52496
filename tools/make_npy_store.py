#!/usr/bin/env python
"""Offline data tooling: build an era5 npy store (the NpyBackend layout).

Counterpart of the reference's data_process/ scripts (weatherbench pruning,
relative-humidity download+zarr consolidation) for this image: converts a
zarr archive (when xarray is present) or generates a synthetic store for
development — writes {out}/era5_{i:06d}.npy (H, W, 73) + sst_{i:06d}.npy.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synthetic_store(out: str, n: int, img_size, channels: int, sst_shape, seed=0):
    from msfno_tpu.data.synthetic import synthetic_land_mask

    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    mask = synthetic_land_mask(*sst_shape)
    # smooth temporal evolution so autoregressive fits are non-trivial
    state = rng.standard_normal((*img_size, channels)).astype(np.float32)
    sst_state = rng.standard_normal(sst_shape).astype(np.float32)
    for i in range(n):
        state = 0.95 * state + 0.05 * rng.standard_normal(state.shape).astype(
            np.float32
        )
        sst_state = 0.98 * sst_state + 0.02 * rng.standard_normal(
            sst_shape
        ).astype(np.float32)
        np.save(os.path.join(out, f"era5_{i:06d}.npy"), state)
        sst = sst_state.copy()
        sst[mask] = np.nan
        np.save(os.path.join(out, f"sst_{i:06d}.npy"), sst)
    print(f"wrote {n} timesteps to {out}")


def zarr_store(out: str, era5_path: str, **kw):  # pragma: no cover
    from msfno_tpu.data.era5 import ZarrBackend

    backend = ZarrBackend(era5_path, **kw)
    os.makedirs(out, exist_ok=True)
    for i in range(len(backend)):
        np.save(os.path.join(out, f"era5_{i:06d}.npy"), backend.era5(i))
        sst = backend.sst(i)
        if sst is not None:
            np.save(os.path.join(out, f"sst_{i:06d}.npy"), sst)
    print(f"converted {len(backend)} timesteps to {out}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--era5-zarr", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--num-steps", type=int, default=64)
    p.add_argument("--img-size", type=int, nargs=2, default=[128, 256])
    p.add_argument("--channels", type=int, default=8)
    p.add_argument("--sst-shape", type=int, nargs=2, default=[32, 64])
    args = p.parse_args()
    if args.synthetic or args.era5_zarr is None:
        synthetic_store(args.out, args.num_steps, tuple(args.img_size),
                        args.channels, tuple(args.sst_shape))
    else:
        zarr_store(args.out, args.era5_zarr)


if __name__ == "__main__":
    main()
