"""Checkpoint-list evaluation driver tests."""

import os

import jax
import numpy as np
import pytest

from msfno_tpu.data.synthetic import gen_batch
from msfno_tpu.inference.eval_checkpoints import (
    evaluate_checkpoints,
    select_checkpoints,
)
from msfno_tpu.models import FourierNeuralOperatorNetFilmed
from msfno_tpu.training import checkpoint as ckpt_io
from msfno_tpu.training.trainer import Trainer
from msfno_tpu.utils.config import TrainConfig
from msfno_tpu.utils.observability import device_memory_stats, system_monitor
from tests.test_training import small_cfg


def test_select_checkpoints(tmp_path):
    for i in range(10):
        (tmp_path / f"checkpoint_iter={i:03d}.npz").write_bytes(b"x")
    sel = select_checkpoints(str(tmp_path / "checkpoint_*.npz"), max_count=4)
    assert len(sel) == 4
    assert sel[0].endswith("000.npz") and sel[-1].endswith("009.npz")


def test_evaluate_checkpoints_with_baseline(tmp_path):
    cfg = small_cfg(film=True)
    tr = Trainer(cfg, TrainConfig(film_scale_start=1.0))
    state = tr.init_state()
    cp = str(tmp_path / "cp.npz")
    ckpt_io.save_checkpoint(cp, state.params, step=1, epoch=0,
                            extra={"film_scale": 1.0})

    steps = 2
    batches = [gen_batch(cfg, 1, steps, seed=i) for i in range(2)]
    clim = np.zeros(cfg.img_size + (cfg.in_chans,), np.float32)
    module = FourierNeuralOperatorNetFilmed(cfg)
    reports = evaluate_checkpoints(
        module, [cp], batches, clim, steps,
        save_path=str(tmp_path / "eval"), include_sfno_baseline=True,
    )
    assert len(reports) == 2  # cp + scale-0 baseline
    for rep in reports.values():
        assert rep.skill.shape == (steps, cfg.in_chans)
        assert np.all(np.isfinite(rep.skill))
    # arrays + plots written
    files = os.listdir(tmp_path / "eval")
    assert any(f.endswith("_skill.npy") for f in files)
    assert "skill.pdf" in files


def test_evaluate_with_binned_climatology(tmp_path):
    """The repo's own build_climatology artifact ((365, 4, H, W, C)) must be
    accepted and time-indexed per target (regression: broadcast_to used to
    raise on it)."""
    cfg = small_cfg(film=True)
    tr = Trainer(cfg, TrainConfig(film_scale_start=1.0))
    state = tr.init_state()
    cp = str(tmp_path / "cp.npz")
    ckpt_io.save_checkpoint(cp, state.params, step=1, epoch=0,
                            extra={"film_scale": 1.0})
    steps = 2
    batches = [gen_batch(cfg, 1, steps, seed=0)]
    h, w = cfg.img_size
    clim = np.random.default_rng(0).standard_normal(
        (365, 4, h, w, cfg.in_chans)).astype(np.float32)
    module = FourierNeuralOperatorNetFilmed(cfg)
    reports = evaluate_checkpoints(module, [cp], batches, clim, steps)
    rep = next(iter(reports.values()))
    assert rep.skill.shape == (steps, cfg.in_chans)
    assert np.all(np.isfinite(rep.skill))


def test_indexed_climatology_lookup():
    """YYYYMMDDHH times select the right (doy, hour) slot, leap-shifted for
    the 365-slot (leap-dropped) layout."""
    from msfno_tpu.inference.evaluate import indexed_climatology

    clim = np.zeros((365, 4, 2, 2, 1), np.float32)
    clim += np.arange(365, dtype=np.float32)[:, None, None, None, None]
    clim += np.arange(4, dtype=np.float32)[None, :, None, None, None] * 1000
    # 2017-01-02 06:00 (doy 2 -> slot 1, hour 6 -> bin 1)
    t_plain = 2017010206
    # 2016-03-01 00:00 (leap year: doy 61 -> slot 59 after the Feb-29 shift)
    t_leap = 2016030100
    times = np.array([[t_plain], [t_leap]], np.int64)
    out = indexed_climatology(clim, times, (2, 1, 2, 2, 1))
    assert out[0, 0, 0, 0, 0] == 1 + 1000
    assert out[1, 0, 0, 0, 0] == 59
    # synthetic time 0 falls back to the all-slot mean
    out0 = indexed_climatology(clim, np.zeros((1, 1), np.int64),
                               (1, 1, 2, 2, 1))
    assert np.isclose(out0[0, 0, 0, 0, 0], clim.mean(axis=(0, 1))[0, 0, 0])


def test_monitors():
    s = system_monitor(printout=False)
    assert s["ram_total_gb"] > 0
    d = device_memory_stats()
    assert len(d) >= 1


def test_select_checkpoints_numeric_order(tmp_path):
    """Trainer writes UNPADDED iter numbers; selection must order by the
    numeric training iteration, not lexicographically (iter=100 < iter=20
    as strings)."""
    import os

    from msfno_tpu.inference.eval_checkpoints import select_checkpoints

    iters = [5, 20, 100, 250, 1000, 3]
    for i in iters:
        open(tmp_path / f"checkpoint_iter={i}_epoch=0.npz", "wb").close()
    got = select_checkpoints(str(tmp_path / "checkpoint_*.npz"), max_count=6)
    assert [os.path.basename(g) for g in got] == [
        f"checkpoint_iter={i}_epoch=0.npz" for i in sorted(iters)
    ]
    sub = select_checkpoints(str(tmp_path / "checkpoint_*.npz"), max_count=3)
    # linspace(0, 5, 3) -> [0, 2.5, 5] -> banker's round -> indices 0, 2, 5
    assert [os.path.basename(s) for s in sub] == [
        "checkpoint_iter=3_epoch=0.npz",
        "checkpoint_iter=20_epoch=0.npz",
        "checkpoint_iter=1000_epoch=0.npz",
    ]
