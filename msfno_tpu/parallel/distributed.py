"""Multi-host bootstrap and scaling measurement.

Replaces the reference's mp.spawn + init_process_group("nccl") single-node
launcher (main.py:39-49, 1149-1156): on TPU pods each host runs the same
program and `jax.distributed.initialize()` wires the global device view;
mesh axes then span ICI within a slice and DCN across slices
(SURVEY.md section 5.8).
"""

from __future__ import annotations

import logging
import time

import jax
import numpy as np

log = logging.getLogger("msfno_tpu")


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Idempotent jax.distributed.initialize wrapper.  On single-host (or
    when TPU auto-bootstrap env vars exist) argument-free init is used."""
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        elif jax.process_count() == 1 and len(jax.devices()) > len(
            jax.local_devices()
        ):
            jax.distributed.initialize()
    except RuntimeError as e:  # already initialized
        log.debug("distributed init skipped: %s", e)
    info = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
    log.info("distributed: %s", info)
    return info


def measure_scaling(step_fn, make_args, device_counts: list[int],
                    iters: int = 5) -> dict[int, dict]:
    """Throughput vs device count for a mesh-parameterized step function.

    step_fn(mesh) -> (callable, args) where callable(*args) returns an array;
    make_args supplies fresh inputs per mesh.  Returns {n: {seconds, rate,
    efficiency}} with efficiency relative to the smallest mesh
    (BASELINE.json: >=80% scaling efficiency target).
    """
    from msfno_tpu.parallel.mesh import make_mesh

    results: dict[int, dict] = {}
    base_rate = None
    for n in device_counts:
        if n > len(jax.devices()):
            log.warning("skipping %d devices (only %d available)", n,
                        len(jax.devices()))
            continue
        mesh = make_mesh(n)
        fn, args = step_fn(mesh)
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        rate = n / dt  # device-steps per second (per-device work fixed)
        if base_rate is None:
            base_rate = rate / n
        results[n] = {
            "seconds": dt,
            "rate": rate,
            "efficiency": rate / (base_rate * n),
        }
        log.info("%d devices: %.4fs/step, efficiency %.1f%%", n, dt,
                 100 * results[n]["efficiency"])
    return results
