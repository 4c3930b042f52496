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
