"""Single-step drift classification of the fused decoder tail.

Compares, from the SAME random-ish state (one exact-tier step from the
zero-init state, so the input is a physical field, not zeros):
  - unfused fast vs exact      (the tier's existing drift class)
  - fused fast   vs exact
  - fused vs unfused fast
A fused path is accepted if its single-step drift vs exact matches the
unfused tier's class (~1.5e-2); chained-rollout rel-L2 between two bf16
variants is NOT a defect signal (chaotic amplification doubles any
epsilon-scale difference per few steps).
"""

import dataclasses
import sys
import time


def rel_l2(a, b):
    import numpy as np

    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return float(((a - b) ** 2).sum() ** 0.5 / max((b**2).sum() ** 0.5, 1e-30))


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from bench import _build

    cfg_exact = ge._flagship_cfg()
    cfg_fast = ge._flagship_cfg(fast=True)
    cfg_fast_off = dataclasses.replace(cfg_fast, fuse_decoder_tail=False)

    t0 = time.perf_counter()
    c_exact, params, x, sst = _build(cfg_exact)
    print(f"exact build {time.perf_counter()-t0:.0f}s", flush=True)
    c_on, _, _, _ = _build(cfg_fast, params=params)
    c_off, _, _, _ = _build(cfg_fast_off, params=params)
    print("fast builds done", flush=True)

    state = c_exact(params, x, sst)  # physical field as the probe input
    y_exact = c_exact(params, state, sst)
    y_on = c_on(params, state, sst)
    y_off = c_off(params, state, sst)
    print(f"unfused fast vs exact: {rel_l2(y_off, y_exact):.3e}", flush=True)
    print(f"fused fast   vs exact: {rel_l2(y_on, y_exact):.3e}", flush=True)
    print(f"fused vs unfused:      {rel_l2(y_on, y_off):.3e}", flush=True)


if __name__ == "__main__":
    main()
