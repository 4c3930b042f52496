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


def _multi_host_env() -> bool:
    """True when the process environment indicates a multi-host launch that
    jax.distributed.initialize() can auto-configure: TPU pod metadata or a
    multi-task SLURM allocation."""
    import os

    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    # >1 hostnames means a pod; single-host stacks (incl. the axon tunnel)
    # set TPU_WORKER_HOSTNAMES=localhost, where argument-free
    # jax.distributed.initialize() would fail wanting a coordinator
    if len([h for h in hosts.split(",") if h.strip()]) > 1:
        return True
    if os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        return True
    try:
        return int(os.environ.get("SLURM_NTASKS", "1")) > 1
    except ValueError:
        return False


def world_size_hint() -> int:
    """Best-effort process count WITHOUT initializing a backend (a wedged
    remote-TPU tunnel would hang a cold `jax.process_count()` forever):
    a live backend's count when one exists, else cluster env vars, else 1.
    Used for the reference's world-size division of the scheduler horizon
    (main.py:136) before any device work happens."""
    import os

    try:
        import jax._src.xla_bridge as xb

        if xb._backends:
            return jax.process_count()
    except Exception:
        pass
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES")
    if hosts:
        return max(len([h for h in hosts.split(",") if h.strip()]), 1)
    for var in ("SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE"):
        try:
            n = int(os.environ.get(var, "1"))
        except ValueError:
            continue
        if n > 1:
            return n
    return 1


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
        elif _multi_host_env():
            # argument-free init resolves the coordinator from the cluster
            # environment (TPU pod metadata / SLURM); only attempted when such
            # an environment is detectable — jax.devices() cannot be consulted
            # here because calling it would initialize the single-host backend
            jax.distributed.initialize()
    except RuntimeError as e:
        # benign: re-init, or a backend that is already up (jax refuses with
        # "must be called before any JAX calls").  Anything else — e.g. an
        # unreachable/typo'd coordinator — must surface: silently proceeding
        # would leave this host training a disjoint single-process replica
        # while the rest of the pod hangs on the rendezvous.
        msg = str(e).lower()
        if "already" not in msg and "must be called before" not in msg:
            raise
        log.debug("distributed init skipped: %s", e)
    info = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
    log.info("distributed: %s", info)
    return info


def measure_scaling(step_fn, device_counts: list[int],
                    iters: int = 5, mode: str = "weak") -> dict[int, dict]:
    """Throughput vs device count for a mesh-parameterized step function.

    step_fn(mesh) -> (callable, args) where callable(*args) returns an array
    (inputs sized for that mesh come from step_fn itself).  mode selects the
    efficiency semantics:
    - "weak": per-device work is fixed as n grows (e.g. global batch = n x
      local batch); ideal step time is constant, efficiency = t_base / t_n;
    - "strong": total work is fixed; ideal step time is t_base * n_base / n,
      efficiency = (t_base * n_base) / (t_n * n).
    Returns {n: {seconds, rate, efficiency}} with efficiency relative to the
    smallest measured mesh (BASELINE.json: >=80% scaling efficiency target).
    """
    from msfno_tpu.parallel.mesh import make_mesh

    if mode not in ("weak", "strong"):
        raise ValueError(f"mode must be 'weak' or 'strong', got {mode!r}")
    results: dict[int, dict] = {}
    timings: dict[int, float] = {}
    # measure smallest-first so the efficiency base is the smallest mesh
    # regardless of the order the caller listed the counts in
    for n in sorted(set(device_counts)):
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
        timings[n] = dt
        n_base = min(timings)
        t_base = timings[n_base]
        if mode == "weak":
            efficiency = t_base / dt
            rate = n / dt  # device-steps/s: per-device work fixed
        else:
            efficiency = (t_base * n_base) / (dt * n)
            rate = 1.0 / dt  # global steps/s: total work fixed
        results[n] = {"seconds": dt, "rate": rate, "efficiency": efficiency}
        log.info("%d devices (%s): %.4fs/step, efficiency %.1f%%", n, mode,
                 dt, 100 * efficiency)
    return results
