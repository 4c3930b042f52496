"""Observability utility tests (Timer, Stepper, LocalLog, provenance,
config JSON round-trip)."""

import json
import os

import numpy as np

from msfno_tpu.utils.config import (
    FilmConfig,
    SFNOConfig,
    TrainConfig,
    from_json,
    to_json,
)
from msfno_tpu.utils.observability import (
    FinTraining,
    LocalLog,
    Stepper,
    Timer,
    create_writer,
    dump_provenance,
)


def test_timer_measures():
    import time

    with Timer() as t:
        time.sleep(0.01)
    assert t.seconds >= 0.005


def test_timer_divisor():
    import time

    with Timer(divisor=10) as t:
        time.sleep(0.02)
    assert t.seconds < 0.02


def test_stepper_logs(caplog):
    import logging

    with caplog.at_level(logging.INFO, logger="msfno_tpu"):
        s = Stepper(total_steps=3)
        for i in range(3):
            s(i, step_hours=6)
    assert any("3/3" in r.getMessage() for r in caplog.records)


def test_local_log_save(tmp_path):
    log = LocalLog(save_dir=str(tmp_path))
    log.log({"loss": 1.0}, step=1)
    log.log({"loss": 0.5}, step=2)
    path = log.save("_t")
    records = np.load(path, allow_pickle=True)
    assert len(records) == 2
    assert records[1]["loss"] == 0.5


def test_create_writer_without_wandb(tmp_path):
    w = create_writer(save_dir=str(tmp_path), use_wandb=True)  # wandb absent
    w.log({"x": 1})
    assert w.mirror is None


def test_provenance_dump(tmp_path):
    p = dump_provenance(str(tmp_path / "prov.json"))
    info = json.loads(open(p).read())
    assert "jax" in info and "devices" in info


def test_fin_training_is_exception():
    try:
        raise FinTraining("done")
    except FinTraining as e:
        assert "done" in str(e)


def test_config_json_roundtrip_nested():
    cfg = SFNOConfig(
        img_size=(64, 128),
        film=FilmConfig(film_gen_type="transformer", sst_shape=(16, 32)),
    )
    back = from_json(to_json(cfg))
    assert back == cfg
    tcfg = TrainConfig(learning_rate=1e-3, time_limit_s=120.0)
    assert from_json(to_json(tcfg)) == tcfg
