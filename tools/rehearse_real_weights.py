"""Full-size fabricated weights.tar rehearsal (VERDICT r4 next-6).

Fabricates an EXACT-layout FourCastNetv2-small checkpoint — every key of
the reference state dict at 721x1440 / 73ch / 12 blocks / embed 256
(reference MSFNO/Models/sfno/model.py:207-271), random values, torch.save
zip format with the module. prefix — plus a minimal full-size ERA5 npy
store, then drives the REAL CLI chain from it on the real chip:

    --run (12h)  ->  --eval-model (1-step skill)  ->  --save-forecast

and records wall-clock for each stage (tar write, torch-free read,
conversion, first forecast).  This proves the full-scale ingest path
(memory, conversion time, zero unconverted keys at 265M-param pos_embed
scale) so the day the physical asset lands is a data-staging exercise.

Usage:
  python tools/rehearse_real_weights.py fabricate   # CPU: tar + store
  python tools/rehearse_real_weights.py run         # TPU: CLI chain
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASE = "/root/rehearsal"
TAR = f"{BASE}/weights.tar"
STORE = f"{BASE}/store"
OUT = f"{BASE}/out"


def fabricate() -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import numpy as np
    import torch
    import jax

    sys.path.insert(0, "/root/repo")
    from msfno_tpu.cli import build_parser, configs_from_args
    from msfno_tpu.models import get_model
    from msfno_tpu.models.convert import export_sfno_state_dict

    os.makedirs(BASE, exist_ok=True)
    os.makedirs(STORE, exist_ok=True)

    t0 = time.perf_counter()
    args = build_parser().parse_args(["--cpu"])  # full-size defaults
    mc, _ = configs_from_args(args)
    wrapper = get_model("sfno", "latest", cfg=mc)
    params = jax.jit(wrapper.init_params)()
    n_params = sum(int(np.prod(v.shape)) for v in jax.tree_util.tree_leaves(params))
    print(f"init full-size params: {n_params/1e6:.1f} M in "
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    sd = {
        f"module.{k}": torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_sfno_state_dict(params).items()
    }
    torch.save({"model_state": sd}, TAR)
    sz = os.path.getsize(TAR) / 1e9
    print(f"weights.tar written: {sz:.2f} GB, {len(sd)} keys in "
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    rng = np.random.default_rng(0)
    # 12 frames: enough history for the save-forecast windowing at
    # --multi-step-validation 2 (4 was too short — measured 2026-08-20)
    for i in range(12):
        np.save(f"{STORE}/era5_{i:06d}.npy",
                rng.standard_normal((721, 1440, 73)).astype(np.float32))
    print(f"12-frame full-size store in {time.perf_counter()-t0:.1f}s",
          flush=True)


def _cli(args: list[str], tag: str) -> float:
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, "main.py"] + args, cwd="/root/repo",
        capture_output=True, text=True, timeout=3000,
    )
    dt = time.perf_counter() - t0
    tail = "\n".join((r.stdout + r.stderr).strip().splitlines()[-4:])
    print(f"--- {tag}: rc={r.returncode} in {dt:.1f}s\n{tail}", flush=True)
    if r.returncode != 0:
        raise SystemExit(f"{tag} failed")
    return dt


def run() -> None:
    os.makedirs(OUT, exist_ok=True)
    timings = {}
    timings["run_12h"] = _cli(
        ["--run", "--lead-time", "12", "--resume-checkpoint", TAR,
         "--output-path", f"{OUT}/run"],
        "run (12h forecast from weights.tar)",
    )
    timings["eval_1step"] = _cli(
        ["--eval-model", "--checkpoint-list", TAR,
         "--era5-path", STORE, "--multi-step-validation", "1",
         "--validation-batches", "1",
         "--output-path", f"{OUT}/eval"],
        "eval-model (1-step skill from weights.tar)",
    )
    timings["save_forecast"] = _cli(
        ["--save-forecast", "--era5-path", STORE,
         "--multi-step-validation", "2", "--validation-batches", "1",
         "--resume-checkpoint", TAR,
         "--output-path", f"{OUT}/fc"],
        "save-forecast (2 steps from weights.tar)",
    )
    print(json.dumps(timings), flush=True)


if __name__ == "__main__":
    {"fabricate": fabricate, "run": run}[sys.argv[1]]()
