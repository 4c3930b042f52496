"""Multi-device SPMD tests on the simulated 8-device CPU mesh
(SURVEY.md section 4: jax CPU-device simulation of multi-host)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msfno_tpu.data.synthetic import gen_batch
from msfno_tpu.parallel import make_mesh, make_sharded_train_step, factorize
from msfno_tpu.parallel.sharded_train import shard_state
from msfno_tpu.training.trainer import Trainer
from msfno_tpu.utils.config import TrainConfig
from tests.test_training import small_cfg


def test_factorize():
    assert np.prod(factorize(8)) == 8
    assert np.prod(factorize(4)) == 4
    assert factorize(1) == (1, 1, 1)


def test_factorize_data_target():
    """Training policy: factors go to the data axis first, up to the global
    batch (BASELINE.md round-5 comm model: the data axis carries no
    per-step all_to_all).  data_target=1 keeps the lat-first inference
    split unchanged."""
    assert factorize(8, data_target=8) == (8, 1, 1)
    assert factorize(8, data_target=4) == (4, 2, 1)
    assert factorize(8, data_target=2) == (2, 2, 2)
    assert factorize(8, data_target=3) == (2, 2, 2)  # only whole factors
    assert factorize(8, data_target=1) == factorize(8)
    assert factorize(12, data_target=6) == (6, 2, 1)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestShardedTraining:
    def test_sharded_step_runs(self):
        mesh = make_mesh(8, shape=(2, 2, 2))
        cfg = small_cfg(film=True)
        tcfg = TrainConfig(batch_size=2, film_scale_start=1.0)
        tr = Trainer(cfg, tcfg)
        state = shard_state(tr.init_state(), mesh)
        step, place = make_sharded_train_step(tr, mesh)
        batch = gen_batch(cfg, 2, 0, seed=0)
        era5, sst = place(batch.era5, batch.sst)
        state, metrics = step(state, era5, sst)
        assert np.isfinite(float(metrics["loss"]))

    def test_sharded_matches_single_device(self):
        """SPMD result == single-device result (same params, same batch)."""
        cfg = small_cfg(film=False)
        # SGD: updates are lr*grad, so single- vs multi-device results are
        # directly comparable (Adam's 1/sqrt(v) amplifies fp noise on
        # near-zero gradients into O(lr) sign-flip differences)
        tcfg = TrainConfig(batch_size=2, learning_rate=1e-3, optimizer="sgd")
        tr = Trainer(cfg, tcfg)
        state0 = tr.init_state()
        batch = gen_batch(cfg, 2, 0, seed=1)
        era5 = jnp.asarray(batch.era5)

        # single device
        s1, m1 = tr._train_step(state0, era5, None)

        # 8-device mesh
        mesh = make_mesh(8, shape=(2, 2, 2))
        tr2 = Trainer(cfg, tcfg)
        sharded = shard_state(tr.init_state(), mesh)  # fresh but same seed
        step, place = make_sharded_train_step(tr2, mesh)
        e2, _ = place(batch.era5)
        s2, m2 = step(sharded, e2, None)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
        # updated params agree
        l1 = jax.tree_util.tree_leaves(s1.trainable)
        l2 = jax.tree_util.tree_leaves(s2.trainable)
        for a, b in zip(l1, l2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5
            )

    def test_dp_only_mesh(self):
        mesh = make_mesh(8, shape=(8, 1, 1))
        cfg = small_cfg(film=False)
        tr = Trainer(cfg, TrainConfig(batch_size=8))
        state = shard_state(tr.init_state(), mesh)
        step, place = make_sharded_train_step(tr, mesh)
        batch = gen_batch(cfg, 8, 0, seed=0)
        era5, _ = place(batch.era5)
        state, metrics = step(state, era5, None)
        assert np.isfinite(float(metrics["loss"]))


def test_dryrun_multichip_entrypoint():
    """The driver-facing dryrun compiles and executes on 8 CPU devices."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_trainer_with_mesh():
    """Trainer(mesh=...) drives the full train loop SPMD."""
    mesh = make_mesh(8, shape=(2, 2, 2))
    cfg = small_cfg(film=True)
    tcfg = TrainConfig(batch_size=2, validation_interval=0, training_epochs=1,
                       film_scale_start=1.0)
    tr = Trainer(cfg, tcfg, mesh=mesh)
    state = tr.init_state()
    state = tr.train(state, num_batches=2)
    assert int(state.step) == 2


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_model_with_sharded_sht_matches():
    """With an active lat>1 mesh, SpectralAttentionS2 switches to the
    all_to_all sharded SHT and the model output matches single-device."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from msfno_tpu.models import FourierNeuralOperatorNet
    from msfno_tpu.parallel.annotate import use_mesh

    cfg = small_cfg(film=False)
    model = FourierNeuralOperatorNet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    y_ref = model.apply(params, x)

    mesh = make_mesh(8, shape=(2, 2, 2))
    xd = jax.device_put(x, NamedSharding(mesh, P("data", "lat", None, None)))
    with use_mesh(mesh):
        y_sh = jax.jit(model.apply)(params, xd)
    np.testing.assert_allclose(
        np.asarray(y_sh), np.asarray(y_ref), rtol=2e-4, atol=2e-4
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_opt_state_inherits_param_shardings():
    """Adam mu/nu for a sharded param (pos_embed) must be sharded with the
    SAME spec, not replicated — replication costs 2x the memory the param
    sharding saves."""
    import optax

    from msfno_tpu.training.trainer import TrainState

    mesh = make_mesh(8, shape=(2, 2, 2))
    params = {
        "pos_embed": jax.numpy.zeros((8, 4, 8)),
        "decoder": {"kernel": jax.numpy.zeros((4, 4))},
    }
    tx = optax.adam(1e-3)
    state = TrainState(
        trainable=params, frozen={}, opt_state=tx.init(params),
        step=jax.numpy.zeros((), jax.numpy.int32),
        film_scale=jax.numpy.ones(()),
    )
    sharded = shard_state(state, mesh)
    pe_spec = sharded.trainable["pos_embed"].sharding.spec
    mu = sharded.opt_state[0].mu
    assert mu["pos_embed"].sharding.spec == pe_spec
    assert pe_spec != jax.sharding.PartitionSpec()  # actually sharded
    # scalar count stays replicated
    assert sharded.opt_state[0].count.sharding.spec == (
        jax.sharding.PartitionSpec()
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_scan_rollout_sharded_matches_single():
    """Mesh-aware scan_rollout (VERDICT r3 missing #2) is numerically the
    single-device rollout: sharded params + lat-sharded SHT change only the
    reduction order (tolerance = collective reorder noise compounded over
    3 autoregressive steps)."""
    from msfno_tpu.inference.rollout import scan_rollout
    from msfno_tpu.models import FourierNeuralOperatorNetFilmed

    cfg = small_cfg(film=True)
    model = FourierNeuralOperatorNetFilmed(cfg)
    b = gen_batch(cfg, 2, 2, seed=3)
    x0 = jnp.asarray(b.era5[0])
    sst_seq = jnp.asarray(b.sst[1:4])
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), x0, sst_seq[0], 1.0
    )["params"]
    y_ref = np.asarray(
        scan_rollout(model, params, x0, 3, sst_seq=sst_seq, scale=1.0)
    )
    mesh = make_mesh(8, shape=(2, 2, 2))
    y_sh = np.asarray(
        scan_rollout(model, params, x0, 3, sst_seq=sst_seq, scale=1.0,
                     mesh=mesh)
    )
    assert y_sh.shape == y_ref.shape
    np.testing.assert_allclose(y_sh, y_ref, rtol=1e-3, atol=1e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_streaming_rollout_sharded(tmp_path):
    """The streaming rollout (registry.running path) also runs SPMD."""
    from msfno_tpu.inference.rollout import RolloutConfig, rollout
    from msfno_tpu.models import FourierNeuralOperatorNet

    cfg = small_cfg(film=False)
    model = FourierNeuralOperatorNet(cfg)
    x0 = np.random.default_rng(0).standard_normal((2, 16, 32, 3)).astype(
        np.float32
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(1), jnp.asarray(x0))[
        "params"
    ]
    mesh = make_mesh(8, shape=(2, 2, 2))
    outs = list(
        rollout(model, params, x0, RolloutConfig(steps=2), mesh=mesh)
    )
    ref = list(rollout(model, params, x0, RolloutConfig(steps=2)))
    assert len(outs) == 2
    np.testing.assert_allclose(
        np.asarray(outs[-1]), np.asarray(ref[-1]), rtol=1e-3, atol=1e-3
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestMeshCheckpoint:
    """Checkpoint/restore under the mesh (VERDICT r3 weak #4): orbax saves a
    mesh-sharded TrainState; restore works onto the SAME mesh and onto a
    DIFFERENTLY-FACTORED mesh, and training resumes."""

    def _train_and_save(self, tmp_path, mesh):
        import os

        from tests.test_training import small_cfg as _cfg

        cfg = _cfg(film=True)
        tcfg = TrainConfig(
            batch_size=2, film_scale_start=1.0, validation_interval=0,
            training_epochs=1, checkpoint_backend="orbax",
        )
        tr = Trainer(cfg, tcfg, mesh=mesh, checkpoint_dir=str(tmp_path))
        state = tr.train(tr.init_state(), num_batches=2)
        cps = [
            os.path.join(tmp_path, f)
            for f in os.listdir(tmp_path)
            if os.path.isdir(os.path.join(tmp_path, f))
            and f.startswith("checkpoint_")
        ]
        assert cps, "orbax checkpoint directory not written"
        return cfg, tcfg, state, cps[-1]

    def _restore_onto(self, cfg, tcfg, cp, mesh):
        from msfno_tpu.parallel.sharded_train import shard_state
        from msfno_tpu.training.checkpoint import load_checkpoint
        from msfno_tpu.training.partition import (
            film_trainable_predicate,
            split_params,
        )

        tr2 = Trainer(cfg, tcfg, mesh=mesh)
        st2 = tr2.init_state()
        params, opt_state, meta = load_checkpoint(
            cp, opt_state_template=st2.opt_state
        )
        pred = film_trainable_predicate(tcfg.retrain_film, cfg.num_layers)
        tr_p, fr_p = split_params(params, pred)
        st2 = dataclasses.replace(
            st2, trainable=tr_p, frozen=fr_p, opt_state=opt_state,
            step=jnp.asarray(meta["step"], jnp.int32),
        )
        return tr2, shard_state(st2, mesh)

    def test_same_mesh_roundtrip(self, tmp_path):
        mesh = make_mesh(8, shape=(2, 2, 2))
        cfg, tcfg, state, cp = self._train_and_save(tmp_path, mesh)
        tr2, st2 = self._restore_onto(cfg, tcfg, cp, mesh)
        # restored params match the trained state exactly
        a = np.asarray(jax.tree_util.tree_leaves(state.trainable)[0])
        b = np.asarray(jax.tree_util.tree_leaves(st2.trainable)[0])
        np.testing.assert_array_equal(a, b)
        assert int(st2.step) == int(state.step) == 2
        # and training continues from it
        batch = gen_batch(cfg, 2, 0, seed=9)
        era5, sst = tr2._device_batch(batch)
        st3, m = tr2._train_step(st2, era5, sst)
        assert np.isfinite(float(m["loss"]))
        assert int(st3.step) == 3

    def test_different_mesh_restore(self, tmp_path):
        mesh = make_mesh(8, shape=(2, 2, 2))
        cfg, tcfg, state, cp = self._train_and_save(tmp_path, mesh)
        mesh2 = make_mesh(8, shape=(1, 4, 2))
        tr2, st2 = self._restore_onto(cfg, tcfg, cp, mesh2)
        batch = gen_batch(cfg, 2, 0, seed=9)
        era5, sst = tr2._device_batch(batch)
        st3, m = tr2._train_step(st2, era5, sst)
        assert np.isfinite(float(m["loss"]))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_trainer_mesh_with_scan_steps():
    """Scan-chained chunks under the mesh: _device_chunk places the
    (K, S, B, ...) stack with divisibility-safe shardings and the sharded
    _train_steps program runs the full chunk."""
    mesh = make_mesh(8, shape=(2, 2, 2))
    cfg = small_cfg(film=True)
    tcfg = TrainConfig(batch_size=2, validation_interval=0,
                       training_epochs=1, film_scale_start=1.0,
                       scan_steps=2)
    tr = Trainer(cfg, tcfg, mesh=mesh)
    state = tr.train(tr.init_state(), num_batches=4)
    assert int(state.step) == 4


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_test_performance_under_mesh():
    """test_model_speed runs the forward under the mesh (the
    --test-performance CLI path with --mesh)."""
    mesh = make_mesh(8, shape=(2, 2, 2))
    tr = Trainer(small_cfg(film=True), TrainConfig(batch_size=2,
                                                   film_scale_start=1.0),
                 mesh=mesh)
    sec = tr.test_model_speed(tr.init_state(), iters=2)
    assert sec > 0
