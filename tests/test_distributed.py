"""Distributed bootstrap + scaling harness smoke tests (CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msfno_tpu.parallel.distributed import initialize_distributed, measure_scaling


def test_initialize_single_host():
    info = initialize_distributed()
    assert info["process_count"] >= 1
    assert info["global_devices"] >= 1


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_measure_scaling_smoke():
    from jax.sharding import NamedSharding, PartitionSpec as P

    def step_fn(mesh):
        sh = NamedSharding(mesh, P("data"))
        n = mesh.shape["data"] * mesh.shape["lat"] * mesh.shape["channel"]
        per_dev = 64
        x = jax.device_put(
            np.random.randn(mesh.shape["data"] * per_dev, 128).astype(np.float32),
            sh,
        )
        f = jax.jit(lambda v: jnp.sum(v @ v.T))
        return f, (x,)

    res = measure_scaling(step_fn, [1, 2, 4], iters=2)
    assert set(res) == {1, 2, 4}
    for r in res.values():
        assert r["seconds"] > 0


def test_bf16_model_close_to_fp32():
    """bf16 compute path stays within bf16-roundoff of the fp32 model."""
    import dataclasses

    from msfno_tpu.models import FourierNeuralOperatorNet
    from tests.test_training import small_cfg

    cfg = small_cfg(film=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 32, 3))
    m32 = FourierNeuralOperatorNet(cfg)
    params = m32.init(jax.random.PRNGKey(1), x)
    y32 = m32.apply(params, x)
    m16 = FourierNeuralOperatorNet(
        dataclasses.replace(cfg, compute_dtype="bfloat16")
    )
    y16 = m16.apply(params, x)
    rel = float(
        jnp.linalg.norm(y16 - y32) / jnp.maximum(jnp.linalg.norm(y32), 1e-9)
    )
    assert rel < 0.05, rel


@pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="CPU XLA lacks BF16xBF16=F32 dots; fast-mode numerics are "
    "verified on TPU by bench.py's parity check",
)
def test_fast_mode_close_to_fp32():
    """The full fast stack (bf16 grid compute + bf16-MXU SHT) stays within a
    few percent of the fp32 model — the precision/perf tradeoff is bounded."""
    import dataclasses

    import jax.numpy as jnp

    from msfno_tpu.models import FourierNeuralOperatorNet
    from tests.test_training import small_cfg

    cfg = small_cfg(film=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 32, 3))
    m32 = FourierNeuralOperatorNet(cfg)
    params = m32.init(jax.random.PRNGKey(1), x)
    y32 = m32.apply(params, x)
    fast_cfg = dataclasses.replace(
        cfg,
        compute_dtype="bfloat16",
        sht_mxu_dtype="bfloat16",
    )
    yfast = FourierNeuralOperatorNet(fast_cfg).apply(params, x)
    rel = float(
        jnp.linalg.norm(yfast - y32) / jnp.maximum(jnp.linalg.norm(y32), 1e-9)
    )
    assert rel < 0.08, rel


def test_world_size_hint_env(monkeypatch):
    """world_size_hint reads cluster env without touching jax backends (a
    wedged remote tunnel would hang a cold process_count())."""
    from msfno_tpu.parallel.distributed import world_size_hint

    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    monkeypatch.setenv("SLURM_NTASKS", "4")
    assert world_size_hint() in (4, __import__("jax").process_count())
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "h0,h1")
    assert world_size_hint() in (2, __import__("jax").process_count())
