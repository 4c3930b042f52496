"""End-to-end MAE -> linear-probe -> ONI demo.

Reproduces the reference's LinearProbingMAE pipeline
(evaluation/LinearProbingMAE.ipynb; Linear_probing, mae/model.py:177-276) on
synthetic data: pretrain a small ContextCast on SST history windows with the
stochastic mask ratio, precompute encoder class tokens, ridge-fit a linear
probe to the ONI index (compute_oni over the Nino-3.4 box), and report the
probe's MAE on held-out time against the day-of-year-climatology baseline —
the reference's numeric yardstick (climatology MAE 0.628, model 0.25-0.40 on
real data; here both numbers are synthetic-data analogues).

Run: python examples/mae_oni_demo.py  [--steps 60] [--fast]
"""

from __future__ import annotations

import os
import sys

# runnable as `python examples/<demo>.py` from anywhere: make the repo root
# importable without requiring an installed package or PYTHONPATH
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import numpy as np


def make_synthetic_sst_series(
    n_days: int = 400, h: int = 16, w: int = 32, seed: int = 0,
    year_len: int = 120,
):
    """Daily SST on a tropical-Pacific-like patch with an ENSO-ish slow
    oscillation in the Nino-3.4 box, plus weather noise and land NaNs.

    year_len: synthetic year length (shorter than 365 so a few hundred days
    give the day-of-year climatology several samples per day — with a single
    sample the anomaly, hence the ONI, is identically zero)."""
    rng = np.random.default_rng(seed)
    lat = np.linspace(8.0, -8.0, h)
    lon = np.linspace(185.0, 245.0, w)
    from msfno_tpu.data.sst import nino34_mask

    box = nino34_mask(lat, lon)
    t = np.arange(n_days)
    enso = 1.2 * np.sin(2 * np.pi * t / (year_len * 1.9)) + 0.4 * np.sin(
        2 * np.pi * t / 97.0
    )
    seasonal = 0.8 * np.sin(2 * np.pi * t / year_len)
    sst = rng.standard_normal((n_days, h, w)).astype(np.float32) * 0.3
    sst += seasonal[:, None, None]
    sst[:, box] += enso[:, None]
    land = np.zeros((h, w), bool)
    land[:3, :5] = True  # a corner continent outside the box
    sst[:, land] = np.nan
    doy = (t % year_len + 1).astype(int)
    return sst, doy, lat, lon, enso


def run(steps: int = 60, window: int = 4, seed: int = 0, n_days: int = 400):
    import jax

    from msfno_tpu.data.sst import compute_oni
    from msfno_tpu.models.registry import get_model
    from msfno_tpu.utils.config import FilmConfig, SFNOConfig

    sst, doy, lat, lon, _ = make_synthetic_sst_series(n_days=n_days, seed=seed)
    oni = compute_oni(sst, doy, lat, lon, smooth_days=30)

    h, w = sst.shape[-2:]
    cfg = SFNOConfig(
        img_size=(h, w), scale_factor=2, in_chans=3, out_chans=3, embed_dim=8,
        num_layers=1, spectral_layers=1,
        film=FilmConfig(
            model_depth=1, embed_dim=64, mlp_dim=64, sst_shape=(h, w),
            temporal_step=window, patch_size=(window, 4, 4),
        ),
    )
    mae = get_model("mae", cfg=cfg)
    mae.init_params(jax.random.PRNGKey(seed))

    # history windows ending at each day (one window per probe target)
    idx = np.arange(window, n_days)
    windows = np.stack([sst[i - window : i] for i in idx])  # (N, T, H, W)
    targets = oni[idx]
    doy_idx = doy[idx]

    # MAE pretraining on shuffled window batches, stochastic mask ratio
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(windows))

    def batches():
        b = 8
        step = 0
        while step < steps:
            sel = order[(step * b) % len(order) : (step * b) % len(order) + b]
            if len(sel) < b:
                sel = order[:b]
            yield windows[sel]
            step += 1

    mae.pretrain(batches(), steps=steps, learning_rate=1e-3, seed=seed)

    # class tokens for every window
    cls_enc, _ = mae.compute_cls_tokens(
        windows[i : i + 32] for i in range(0, len(windows), 32)
    )

    # train/val split by time (like the reference's year split)
    split = int(0.7 * len(windows))
    probe = get_model("mae", "lin-probe", cfg=cfg)
    probe.fit(cls_enc[:split], targets[:split], l2=1e-3)
    model_mae = probe.mae_metric(cls_enc[split:], targets[split:])

    # climatology baseline: day-of-year mean ONI from the training span
    clim = np.zeros(367)
    cnt = np.zeros(367)
    for v, d in zip(targets[:split], doy_idx[:split]):
        clim[d] += v
        cnt[d] += 1
    clim = clim / np.maximum(cnt, 1)
    clim_pred = clim[doy_idx[split:]]
    clim_mae = float(np.mean(np.abs(clim_pred - targets[split:])))

    return {"model_mae": float(model_mae), "climatology_mae": clim_mae}


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--fast", action="store_true", help="tiny run for smoke tests")
    a = p.parse_args()
    res = run(steps=8 if a.fast else a.steps, n_days=200 if a.fast else 400)
    print(json.dumps(res))
