"""Timers, progress stepper, metric logging and provenance.

Reference counterparts: Timer / LocalLog (MSFNO/utils.py:10-58), Stepper
(MSFNO/Models/stepper.py:14-45), wandb+LocalLog mirroring and mem_log
(MSFNO/Models/train.py:75-144, 656-777, 747-756), provenance dump
(MSFNO/Models/provenance.py:262-281).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import platform
import time
from typing import Any

import numpy as np

log = logging.getLogger("msfno_tpu")


class Timer:
    """Wall-clock context manager (reference Timer, utils.py:10-26)."""

    def __init__(self, label: str = "", divisor: int = 1):
        self.label = label
        self.divisor = max(divisor, 1)
        self.seconds = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = (time.perf_counter() - self._t0) / self.divisor
        if self.label:
            log.info("%s: %.3fs", self.label, self.seconds)
        return False


class FinTraining(Exception):
    """Clean unwind of the training loop (reference FinTraining,
    MSFNO/utils.py; caught in main.py:271-272)."""


class Stepper:
    """Per-step throughput/ETA logger for inference rollouts
    (reference Stepper, stepper.py:14-45)."""

    def __init__(self, total_steps: int, log_every: int = 1):
        self.total = total_steps
        self.log_every = max(log_every, 1)  # 0 would ZeroDivisionError
        self.t0 = time.perf_counter()

    def __call__(self, i: int, step_hours: int | None = None):
        if (i + 1) % self.log_every:
            return
        elapsed = time.perf_counter() - self.t0
        rate = (i + 1) / elapsed
        eta = (self.total - i - 1) / max(rate, 1e-9)
        lead = f" (+{step_hours * (i + 1)}h)" if step_hours else ""
        log.info(
            "step %d/%d%s: %.2f steps/s, ETA %.0fs", i + 1, self.total, lead, rate, eta
        )


class LocalLog:
    """Append-dict metric log saved as .npy (reference LocalLog,
    utils.py:39-58).  Doubles as the writer interface — a wandb run can be
    attached via `mirror`."""

    def __init__(self, save_dir: str | None = None, mirror=None):
        self.save_dir = save_dir
        self.mirror = mirror  # e.g. a wandb run object with .log(dict)
        self.records: list[dict[str, Any]] = []

    def log(self, metrics: dict[str, Any], step: int | None = None):
        rec = dict(metrics)
        if step is not None:
            rec["_step"] = step
        self.records.append(rec)
        if self.mirror is not None:
            # forward the training iteration: wandb's auto-increment would
            # put train/val cadences on a compressed call-count axis and
            # restart resumed runs from the wrong step
            if step is not None:
                self.mirror.log(metrics, step=step)
            else:
                self.mirror.log(metrics)

    def save(self, tag: str = ""):
        if self.save_dir is None:
            return None
        os.makedirs(self.save_dir, exist_ok=True)
        path = os.path.join(self.save_dir, f"training_log{tag}.npy")
        np.save(path, np.asarray(self.records, dtype=object), allow_pickle=True)
        return path


def gather_provenance_info() -> dict[str, Any]:
    """Module versions / platform / device info (reference
    provenance.py:262-281, minus the GPU- and git-specific probes)."""
    import jax

    info = {
        "platform": platform.platform(),
        "python": platform.python_version(),
        "time": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "jax": jax.__version__,
        "devices": [str(d) for d in jax.devices()],
        "default_backend": jax.default_backend(),
    }
    for mod in ("flax", "optax", "numpy"):
        try:
            info[mod] = __import__(mod).__version__
        except Exception:
            info[mod] = None
    return info


def dump_provenance(path: str) -> str:
    with open(path, "w") as f:
        json.dump(gather_provenance_info(), f, indent=2)
    return path


def system_monitor(printout: bool = True) -> dict:
    """RAM/CPU/per-process stats via psutil (reference system_monitor,
    provenance.py:15-53)."""
    import psutil

    vm = psutil.virtual_memory()
    proc = psutil.Process()
    stats = {
        "ram_total_gb": round(vm.total / 2**30, 2),
        "ram_used_gb": round(vm.used / 2**30, 2),
        "ram_percent": vm.percent,
        "cpu_percent": psutil.cpu_percent(interval=0.1),
        "process_rss_gb": round(proc.memory_info().rss / 2**30, 2),
        "process_cpu_percent": proc.cpu_percent(interval=0.1),
    }
    if printout:
        log.info("system: %s", stats)
    return stats


def device_memory_stats() -> list[dict]:
    """Per-device HBM stats (replaces torch.cuda.memory_allocated mem_log,
    reference train.py:747-756)."""
    import jax

    out = []
    for d in jax.devices():
        try:
            s = d.memory_stats() or {}
            out.append(
                {
                    "device": str(d),
                    "bytes_in_use": s.get("bytes_in_use"),
                    "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                    "bytes_limit": s.get("bytes_limit"),
                }
            )
        except Exception:
            out.append({"device": str(d)})
    return out


def create_writer(
    save_dir: str | None = None,
    use_wandb: bool = False,
    project: str | None = None,
    run_name: str | None = None,
    resume_id: str | None = None,
) -> "LocalLog":
    """Writer factory (reference set_logger, train.py:75-144): a LocalLog
    that mirrors into a wandb run when requested and available.  wandb run
    resume via resume_id uses resume="must" (train.py:106-114).

    Multi-host: non-zero ranks keep in-memory records but neither save to
    disk nor open wandb — rank-0-only logging is the reference's contract
    (train.py:75-144) and two ranks appending the same .npy on shared
    storage can interleave-corrupt it."""
    try:
        import jax

        # public signal only: process_index() initializes the backend on
        # first call, which is fine for every create_writer call site (the
        # mesh is resolved before any writer is created); == 0 also covers
        # the single-process case where distributed init never ran
        rank0 = jax.process_index() == 0
    except Exception:
        rank0 = True
    if not rank0:
        save_dir, use_wandb = None, False
    mirror = None
    if use_wandb:
        try:
            import wandb  # type: ignore

            kwargs = dict(project=project or "msfno-tpu", name=run_name)
            if resume_id:
                kwargs.update(id=resume_id, resume="must")
            mirror = wandb.init(**kwargs)
        except Exception as e:  # wandb absent in this image
            log.warning("wandb unavailable (%s); logging locally only", e)
    return LocalLog(save_dir=save_dir, mirror=mirror)
