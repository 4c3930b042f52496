"""Trainer tests: loss semantics, freezing, end-to-end training steps,
checkpoint round-trips (SURVEY.md section 4 test plan)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msfno_tpu.data.synthetic import gen_batch, synthetic_land_mask, synthetic_loader
from msfno_tpu.training import checkpoint as ckpt_io
from msfno_tpu.training.losses import (
    cosine_mse,
    l2_sphere,
    l2_sphere_nosine,
    normal_crps,
    spectral_l2loss_sphere,
)
from msfno_tpu.training.partition import (
    film_trainable_predicate,
    merge_params,
    split_params,
)
from msfno_tpu.training.trainer import Trainer
from msfno_tpu.utils.config import FilmConfig, SFNOConfig, TrainConfig
from msfno_tpu.ops.sht import RealSHT


def small_cfg(film=False):
    f = (
        FilmConfig(
            film_gen_type="gcn_custom",
            model_depth=1,
            embed_dim=16,
            mlp_dim=16,
            num_film_features=8,
            sst_shape=(8, 16),
            temporal_step=2,
            patch_size=(2, 4, 4),
        )
        if film
        else None
    )
    return SFNOConfig(
        img_size=(16, 32),
        scale_factor=2,
        in_chans=3,
        out_chans=3,
        embed_dim=8,
        num_layers=2,
        spectral_layers=1,
        film=f,
    )


class TestLosses:
    def test_zero_at_equal(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32, 3))
        assert float(l2_sphere_nosine(x, x)) == pytest.approx(0.0, abs=1e-6)
        assert float(l2_sphere(x, x)) == pytest.approx(0.0, abs=1e-6)
        assert float(cosine_mse(x, x)) == pytest.approx(0.0, abs=1e-6)

    def test_positive_and_finite(self):
        k = jax.random.PRNGKey(1)
        x = jax.random.normal(k, (2, 16, 32, 3))
        y = x + 0.1
        for fn in (l2_sphere_nosine, l2_sphere, cosine_mse):
            v = float(fn(x, y))
            assert np.isfinite(v) and v > 0

    def test_relative_scaling_invariance(self):
        """Relative L2 is invariant to global rescaling of (prd, tar)."""
        k = jax.random.PRNGKey(2)
        x = jax.random.normal(k, (1, 16, 32, 2))
        y = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 32, 2))
        a = float(l2_sphere_nosine(x, y))
        b = float(l2_sphere_nosine(10 * x, 10 * y))
        np.testing.assert_allclose(a, b, rtol=1e-5)

    def test_spectral_l2_parseval(self):
        """Spectral L2 via SHT matches grid-space quadrature L2 (Parseval)."""
        nlat, nlon, lmax = 32, 64, 16
        sht = RealSHT(nlat, nlon, lmax=lmax, mmax=lmax + 1)
        from msfno_tpu.ops.sht import InverseRealSHT

        isht = InverseRealSHT(nlat, nlon, lmax=lmax, mmax=lmax + 1)
        # band-limited field
        from tests.test_sht import _random_coeffs

        coeffs = _random_coeffs(jax.random.PRNGKey(4), lmax, lmax + 1, 1)
        x = isht(coeffs)[None]  # (1, H, W, 1)
        spec = float(spectral_l2loss_sphere(sht, x, jnp.zeros_like(x)))
        # grid norm: 2*pi*sum_k w_k mean_lon x^2
        from msfno_tpu.ops.quadrature import legendre_gauss

        _, w = legendre_gauss(nlat)
        grid = float(
            2 * np.pi * np.sum(np.asarray(w)[:, None] * np.mean(np.asarray(x[0, :, :, 0]) ** 2, axis=-1, keepdims=True))
        )
        np.testing.assert_allclose(spec, grid, rtol=1e-3)

    def test_normal_crps_perfect_forecast(self):
        """CRPS -> 0 as sigma -> 0 with mu == obs."""
        obs = jnp.ones((4, 4))
        v = float(
            normal_crps(obs, jnp.full((4, 4), -20.0), obs, sigma_transform="softplus")
        )
        assert abs(v) < 1e-6

    def test_normal_crps_mask(self):
        obs = jnp.zeros((2, 2))
        mu = jnp.asarray([[0.0, 5.0], [0.0, 5.0]])
        sigma = jnp.zeros((2, 2))
        mask = jnp.asarray([[1.0, 0.0], [1.0, 0.0]])
        masked = float(normal_crps(mu, sigma, obs, mask=mask))
        good = float(normal_crps(jnp.zeros((2, 2)), sigma, obs))
        np.testing.assert_allclose(masked, good, atol=1e-6)


class TestPartition:
    def test_film_only(self):
        params = {
            "encoder": {"w": jnp.ones(3)},
            "film_gen": {"w": jnp.ones(2)},
            "blocks_0": {"w": jnp.ones(1)},
            "decoder": {"w": jnp.ones(1)},
        }
        pred = film_trainable_predicate(False, num_layers=2)
        t, f = split_params(params, pred)
        assert set(t) == {"film_gen"}
        assert set(f) == {"encoder", "blocks_0", "decoder"}
        merged = merge_params(t, f)
        assert set(merged) == set(params)

    def test_retrain_film(self):
        params = {
            "film_gen": {"w": jnp.ones(2)},
            "blocks_0": {"w": jnp.ones(1)},
            "blocks_1": {"w": jnp.ones(1)},
            "decoder": {"w": jnp.ones(1)},
            "encoder": {"w": jnp.ones(1)},
        }
        pred = film_trainable_predicate(True, num_layers=2, retrain_blocks=1)
        t, _ = split_params(params, pred)
        assert set(t) == {"film_gen", "blocks_1", "decoder"}


class TestTrainer:
    def test_plain_training_reduces_loss(self):
        cfg = small_cfg(film=False)
        tcfg = TrainConfig(
            batch_size=2, learning_rate=1e-3, validation_interval=0, training_epochs=1
        )
        tr = Trainer(cfg, tcfg)
        state = tr.init_state()
        batch = gen_batch(cfg, 2, 0, seed=0)
        era5 = jnp.asarray(batch.era5)
        losses = []
        for _ in range(8):
            state, m = tr._train_step(state, era5, None)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]

    def test_filmed_step_only_updates_film(self):
        cfg = small_cfg(film=True)
        # scale must be nonzero for film gradients to exist (FiLM is scaled
        # by the ramp; at scale=0 the modulation is the identity)
        tcfg = TrainConfig(batch_size=1, learning_rate=1e-3, film_scale_start=1.0)
        tr = Trainer(cfg, tcfg)
        state = tr.init_state()
        frozen_before = jax.tree_util.tree_map(np.asarray, state.frozen)
        batch = gen_batch(cfg, 1, 0, seed=0)
        era5, sst = jnp.asarray(batch.era5), jnp.asarray(batch.sst)
        state2, m = tr._train_step(state, era5, sst)
        assert np.isfinite(float(m["loss"]))
        # frozen params unchanged bit-for-bit
        for (p1, p2) in zip(
            jax.tree_util.tree_leaves(frozen_before),
            jax.tree_util.tree_leaves(state2.frozen),
        ):
            np.testing.assert_array_equal(p1, np.asarray(p2))
        # film params changed
        diffs = [
            float(np.abs(np.asarray(a) - np.asarray(b)).max())
            for a, b in zip(
                jax.tree_util.tree_leaves(state.trainable),
                jax.tree_util.tree_leaves(state2.trainable),
            )
        ]
        assert max(diffs) > 0

    def test_scan_chained_steps_match_dispatched(self):
        # trainer.train_steps runs K optimizer steps in one lax.scan
        # program; must equal K dispatched _train_step calls exactly
        cfg = small_cfg(film=False)
        tcfg = TrainConfig(batch_size=1, learning_rate=1e-3)
        tr = Trainer(cfg, tcfg)
        state = tr.init_state()
        k = 3
        batches = [gen_batch(cfg, 1, 0, seed=i) for i in range(k)]
        era5_k = jnp.stack([jnp.asarray(b.era5) for b in batches])

        s_disp = state
        losses = []
        for i in range(k):
            s_disp, m = tr._train_step(s_disp, era5_k[i], None)
            losses.append(float(m["loss"]))
        s_scan, ms = tr.train_steps(state, era5_k)
        np.testing.assert_allclose(np.asarray(ms["loss"]), losses, rtol=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(s_disp.trainable),
            jax.tree_util.tree_leaves(s_scan.trainable),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_bf16_frozen_params(self):
        # bf16_frozen_params stores the frozen backbone in bfloat16 (HBM
        # traffic lever); loss must stay close to the fp32-frozen trainer
        # and trainable params must remain fp32
        cfg = small_cfg(film=True)
        kw = dict(batch_size=1, learning_rate=1e-3, film_scale_start=1.0)
        tr32 = Trainer(cfg, TrainConfig(**kw))
        tr16 = Trainer(cfg, TrainConfig(**kw, bf16_frozen_params=True))
        s32 = tr32.init_state()
        s16 = tr16.init_state()
        assert all(
            x.dtype == jnp.bfloat16
            for x in jax.tree_util.tree_leaves(s16.frozen)
            if jnp.issubdtype(x.dtype, jnp.floating)
        )
        assert all(
            x.dtype == jnp.float32
            for x in jax.tree_util.tree_leaves(s16.trainable)
            if jnp.issubdtype(x.dtype, jnp.floating)
        )
        batch = gen_batch(cfg, 1, 0, seed=0)
        era5, sst = jnp.asarray(batch.era5), jnp.asarray(batch.sst)
        _, m32 = tr32._train_step(s32, era5, sst)
        s16b, m16 = tr16._train_step(s16, era5, sst)
        l32, l16 = float(m32["loss"]), float(m16["loss"])
        assert np.isfinite(l16)
        assert abs(l16 - l32) / abs(l32) < 5e-2
        # updates still flow and stay fp32
        assert all(
            x.dtype == jnp.float32
            for x in jax.tree_util.tree_leaves(s16b.trainable)
            if jnp.issubdtype(x.dtype, jnp.floating)
        )

    def test_multi_step_discount(self):
        cfg = small_cfg(film=False)
        tcfg = TrainConfig(
            batch_size=1,
            multi_step_training=2,
            discount_factor=0.5,
            training_step_skip=1,
        )
        tr = Trainer(cfg, tcfg)
        state = tr.init_state()
        batch = gen_batch(cfg, 1, 2, seed=0)
        state, m = tr._train_step(state, jnp.asarray(batch.era5), None)
        # steps scored: 0 and 2 (skip=1) -> per_step has 2 entries
        assert m["per_step"].shape == (2,)

    def test_train_loop_with_validation(self, tmp_path):
        cfg = small_cfg(film=True)
        tcfg = TrainConfig(
            batch_size=1,
            validation_interval=2,
            training_epochs=1,
            film_scale_start=0.0,
        )
        tr = Trainer(cfg, tcfg, checkpoint_dir=str(tmp_path))
        state = tr.init_state()
        state = tr.train(state, num_batches=4)
        # scale ramped by validations
        assert float(state.film_scale) > 0
        cps = [f for f in os.listdir(tmp_path) if f.endswith(".npz")]
        assert cps
        # the deferred-flush pipeline must log each train step exactly once,
        # in order, interleaved before its validation record
        steps = [r["_step"] for r in tr.writer.records if "loss" in r]
        assert steps == [1, 2, 3, 4]
        recs = tr.writer.records
        i_train2 = next(i for i, r in enumerate(recs) if r.get("_step") == 2
                        and "loss" in r)
        i_val2 = next(i for i, r in enumerate(recs)
                      if "validation loss step=0" in r)
        assert i_train2 < i_val2
        # host-mirrored iteration counter matches the device step counter
        assert tr.iter == int(state.step) == 4

    def test_scan_steps_train_loop_equivalence(self):
        """`--scan-steps K` must be a pure dispatch optimization: the full
        train() loop with K=2 reproduces the K=1 loop exactly — same logged
        step sequence and record order (train rows before their validation),
        same losses, same final params — across validation boundaries,
        mid-chunk loader tails, and epoch boundaries."""
        cfg = small_cfg(film=True)
        common = dict(
            batch_size=1,
            learning_rate=1e-3,
            validation_interval=3,
            training_epochs=2,
            film_scale_start=0.0,
        )

        def run(k):
            tr = Trainer(cfg, TrainConfig(**common, scan_steps=k))
            state = tr.init_state()
            # 7 batches/epoch with vi=3 and K=2 exercises: full chunks,
            # the pre-boundary single fallback (room<K), the end-of-epoch
            # buffered tail, and the epoch restart
            state = tr.train(state, num_batches=7)
            return tr, state

        tr1, s1 = run(1)
        tr2, s2 = run(2)

        def trace(tr):
            out = []
            for r in tr.writer.records:
                if "loss" in r:
                    out.append(("train", r["_step"], r["loss"]))
                elif "validation loss step=0" in r:
                    out.append(("val", r["_step"], r["validation loss step=0"]))
            return out

        t1, t2 = trace(tr1), trace(tr2)
        assert [(k, s) for k, s, _ in t1] == [(k, s) for k, s, _ in t2]
        np.testing.assert_allclose(
            [v for _, _, v in t1], [v for _, _, v in t2], rtol=1e-5
        )
        assert tr1.iter == tr2.iter == int(s2.step) == 14
        for a, b in zip(
            jax.tree_util.tree_leaves(s1.trainable),
            jax.tree_util.tree_leaves(s2.trainable),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            )
        assert float(s1.film_scale) == float(s2.film_scale)

    def test_scan_steps_ragged_final_batch(self):
        """A drop_last=False-style loader tail (smaller batch mid-stream)
        must fall back to single-step dispatch instead of crashing the
        rectangular (K, S, B, ...) chunk stack."""
        cfg = small_cfg(film=False)
        tr = Trainer(cfg, TrainConfig(batch_size=2, validation_interval=0,
                                      training_epochs=1, scan_steps=2))
        state = tr.init_state()
        # 3 full batches then a ragged half batch: positions it INSIDE the
        # second chunk buffer, the case np.stack used to raise on
        batches = [gen_batch(cfg, 2, 0, seed=i) for i in range(3)]
        batches.append(gen_batch(cfg, 1, 0, seed=99))
        state = tr.train(state, loader=lambda epoch: iter(batches),
                         num_batches=4)
        assert tr.iter == int(state.step) == 4
        steps = [r["_step"] for r in tr.writer.records if "loss" in r]
        assert steps == [1, 2, 3, 4]

    def test_time_limit_graceful_stop(self, tmp_path):
        """Hitting the wall mid-epoch unwinds via FinTraining: the deferred
        metric of the already-dispatched step is flushed and a final
        checkpoint is written (reference time_limit_stop + finalise,
        train.py:354-364, 821-828)."""
        cfg = small_cfg(film=False)
        tcfg = TrainConfig(batch_size=1, validation_interval=0,
                           training_epochs=1)
        tr = Trainer(cfg, tcfg, checkpoint_dir=str(tmp_path))
        state = tr.init_state()

        calls = {"n": 0}
        orig = tr._check_time_limit

        def limited():
            calls["n"] += 1
            if calls["n"] > 2:  # stop before dispatching step 3
                from msfno_tpu.utils.observability import FinTraining

                raise FinTraining("time limit reached")
            return orig()

        tr._check_time_limit = limited
        state = tr.train(state, num_batches=10)
        steps = [r["_step"] for r in tr.writer.records if "loss" in r]
        assert steps == [1, 2]  # both dispatched steps logged, none lost
        cps = [f for f in os.listdir(tmp_path) if f.endswith(".npz")]
        assert any("iter=2" in c for c in cps)

    def test_checkpoint_roundtrip(self, tmp_path):
        cfg = small_cfg(film=False)
        tr = Trainer(cfg, TrainConfig())
        state = tr.init_state()
        path = str(tmp_path / "cp.npz")
        ckpt_io.save_checkpoint(
            path, state.params, opt_state=state.opt_state, step=3, epoch=1,
            config_json="{}",
        )
        meta = ckpt_io.peek(path)
        assert meta["step"] == 3 and meta["epoch"] == 1
        params, opt_state, _ = ckpt_io.load_checkpoint(
            path, opt_state_template=state.opt_state
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(state.params),
        ):
            np.testing.assert_array_equal(a, np.asarray(b))
        assert opt_state is not None

    def test_checkpoint_roundtrip_orbax(self, tmp_path):
        cfg = small_cfg(film=False)
        tr = Trainer(cfg, TrainConfig())
        state = tr.init_state()
        path = str(tmp_path / "cp_orbax")
        ckpt_io.save_checkpoint_orbax(
            path, state.params, opt_state=state.opt_state, step=5, epoch=2,
            config_json="{}",
        )
        meta = ckpt_io.peek_orbax(path)
        assert meta["step"] == 5 and meta["epoch"] == 2
        params, opt_state, _ = ckpt_io.load_checkpoint_orbax(
            path, opt_state_template=state.opt_state
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(state.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert opt_state is not None
        assert jax.tree_util.tree_structure(opt_state) == (
            jax.tree_util.tree_structure(state.opt_state)
        )

    def test_model_speed_harness(self):
        cfg = small_cfg(film=False)
        tr = Trainer(cfg, TrainConfig())
        state = tr.init_state()
        sec = tr.test_model_speed(state, iters=2)
        assert sec > 0

    def test_accumulation(self):
        cfg = small_cfg(film=False)
        tcfg = TrainConfig(batch_size=1, accumulation_steps=1)
        tr = Trainer(cfg, tcfg)
        state = tr.init_state()
        batch = gen_batch(cfg, 1, 0, seed=0)
        era5 = jnp.asarray(batch.era5)
        p0 = jax.tree_util.tree_leaves(state.trainable)[0]
        # first micro-step: MultiSteps should not yet apply updates
        state, _ = tr._train_step(state, era5, None)
        p1 = jax.tree_util.tree_leaves(state.trainable)[0]
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
        state, _ = tr._train_step(state, era5, None)
        p2 = jax.tree_util.tree_leaves(state.trainable)[0]
        assert np.abs(np.asarray(p2) - np.asarray(p1)).max() > 0


class TestSynthetic:
    def test_land_mask_fraction(self):
        m = synthetic_land_mask(32, 64, frac=0.3)
        assert 0.2 < m.mean() < 0.4

    def test_batch_shapes(self):
        cfg = small_cfg(film=True)
        b = gen_batch(cfg, batch_size=2, multi_step=1)
        assert b.era5.shape == (3, 2, 16, 32, 3)
        assert b.sst.shape == (3, 2, 2, 8, 16)
        assert np.isnan(b.sst).any()


class TestReproducibility:
    def test_same_seed_same_loss(self):
        """Seeded init + synthetic data give bitwise-reproducible training
        (reference pre_epoch seeding semantics, train.py:300-305)."""
        cfg = small_cfg(film=False)
        tcfg = TrainConfig(batch_size=1, seed=123)
        losses = []
        for _ in range(2):
            tr = Trainer(cfg, tcfg)
            state = tr.init_state()
            batch = gen_batch(cfg, 1, 0, seed=tcfg.seed)
            state, m = tr._train_step(state, jnp.asarray(batch.era5), None)
            losses.append(float(m["loss"]))
        assert losses[0] == losses[1]


class TestAccumulationSemantics:
    def test_acc_matches_full_batch(self):
        """acc=1 over two half-batches == acc=0 over the concatenated batch
        (reference sums grads of 1/(acc+1)-scaled losses, train.py:162,177-185;
        here optax.MultiSteps averages unscaled-loss grads — same update)."""
        cfg = small_cfg(film=False)
        base = dict(optimizer="sgd", loss_fn="MSE", learning_rate=1e-2)
        full = gen_batch(cfg, 2, 0, seed=7)
        a = dataclasses.replace(full, era5=full.era5[:, :1])
        b = dataclasses.replace(full, era5=full.era5[:, 1:])

        tr_acc = Trainer(cfg, TrainConfig(accumulation_steps=1, **base))
        st = tr_acc.init_state()
        st, _ = tr_acc._train_step(st, jnp.asarray(a.era5), None)
        st, _ = tr_acc._train_step(st, jnp.asarray(b.era5), None)

        tr_full = Trainer(cfg, TrainConfig(accumulation_steps=0, **base))
        st_full = tr_full.init_state()
        st_full, _ = tr_full._train_step(st_full, jnp.asarray(full.era5), None)

        la = jax.tree_util.tree_leaves(st.trainable)
        lf = jax.tree_util.tree_leaves(st_full.trainable)
        for x, y in zip(la, lf):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


class TestSpectralLossReduction:
    def test_channel_sum_semantics(self):
        """Reference sums spectral norms over channels, means over batch only
        (losses.py:163-174): duplicating a channel doubles the loss."""
        k = jax.random.PRNGKey(5)
        x = jax.random.normal(k, (2, 16, 32, 1))
        y = jax.random.normal(jax.random.PRNGKey(6), (2, 16, 32, 1))
        sht = RealSHT(16, 32, lmax=8, mmax=9)
        one = float(spectral_l2loss_sphere(sht, x, y))
        two = float(
            spectral_l2loss_sphere(
                sht, jnp.concatenate([x, x], -1), jnp.concatenate([y, y], -1)
            )
        )
        np.testing.assert_allclose(two, 2 * one, rtol=1e-5)

    def test_registry_exposes_all_field_losses(self):
        from msfno_tpu.training.losses import LOSSES, get_loss

        for name in ("CosineMSE", "L2Sphere", "L2Sphere_noSine", "MSE", "L1",
                     "SpectralL2Sphere", "SpectralSphere", "H1Sphere"):
            assert name in LOSSES
            x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 32, 2))
            v = float(get_loss(name)(x, x * 1.1))
            assert np.isfinite(v) and v >= 0


class TestLoaderEpochProtocol:
    def test_plain_iterator_multi_epoch_raises(self):
        cfg = small_cfg(film=False)
        tr = Trainer(cfg, TrainConfig(training_epochs=2, validation_interval=0))
        batches = iter([gen_batch(cfg, 1, 0, seed=0)])
        st = tr.init_state()
        with pytest.raises(ValueError, match="plain iterator"):
            tr.train(st, loader=batches)

    def test_callable_loader_called_per_epoch(self):
        cfg = small_cfg(film=False)
        tr = Trainer(cfg, TrainConfig(training_epochs=2, validation_interval=0))
        calls = []

        def factory(epoch):
            calls.append(epoch)
            return iter([gen_batch(cfg, 1, 0, seed=epoch)])

        st = tr.init_state()
        tr.train(st, loader=factory)
        assert calls == [0, 1]


class TestSpectralLossTruncation:
    def test_model_cfg_truncates_loss_sht(self):
        """With a model config, the spectral losses' SHT is truncated to the
        model's own modes (the reference hands its truncated trans_down to
        these losses, sfnonet.py:532-545) — untruncated at 721x1440 the
        Legendre weights alone would be ~1.5 GB."""
        import jax.numpy as jnp

        from msfno_tpu.training.losses import _loss_sht, get_loss
        from msfno_tpu.utils.config import SFNOConfig

        cfg = SFNOConfig(img_size=(16, 32), scale_factor=2, in_chans=3,
                         out_chans=3, embed_dim=8, num_layers=2)
        loss = get_loss("SpectralL2Sphere", cfg)
        prd = jnp.ones((1, 16, 32, 3)) * 0.5
        tar = jnp.zeros((1, 16, 32, 3))
        val = float(loss(prd, tar))
        assert np.isfinite(val) and val > 0
        sht = _loss_sht(16, 32, cfg.modes_lat, cfg.modes_lon)
        assert sht.lmax == cfg.modes_lat < 16
        assert sht.mmax == cfg.modes_lon < 17

    def test_without_cfg_full_modes(self):
        from msfno_tpu.training.losses import _loss_sht, get_loss
        import jax.numpy as jnp

        loss = get_loss("H1Sphere")
        val = float(loss(jnp.ones((1, 8, 16, 2)), jnp.zeros((1, 8, 16, 2))))
        assert np.isfinite(val)
        assert _loss_sht(8, 16, None, None).lmax == 8


def test_dropout_active_during_training():
    """drop_rate > 0 must actually drop during train steps: the same batch
    at two different optimizer steps sees different dropout masks, and the
    rollout loss under rngs differs from the deterministic loss."""
    import dataclasses

    from msfno_tpu.training.trainer import Trainer
    from msfno_tpu.utils.config import TrainConfig

    cfg = dataclasses.replace(small_cfg(film=False), drop_rate=0.5)
    tr = Trainer(cfg, TrainConfig(batch_size=1))
    state = tr.init_state()
    from msfno_tpu.data.synthetic import gen_batch

    b = gen_batch(cfg, 1, 0, seed=0)
    params = state.params
    det = float(tr._rollout_loss(params, b.era5, None, 1.0)[0])
    l0 = float(tr._rollout_loss(params, b.era5, None, 1.0,
                                rngs=tr._train_rngs(0))[0])
    l1 = float(tr._rollout_loss(params, b.era5, None, 1.0,
                                rngs=tr._train_rngs(1))[0])
    assert l0 != det and l0 != l1


class TestAutoScanSteps:
    """--scan-steps auto (VERDICT r3 weak #3): K divides the validation
    interval and the stacked input chunk respects an HBM budget."""

    def test_divisor_of_validation_interval(self):
        from msfno_tpu.training.trainer import auto_scan_steps

        cfg = small_cfg()
        tcfg = TrainConfig(batch_size=1, validation_interval=100)
        # tiny shapes: budget never binds -> largest divisor of 100 <= 16
        k = auto_scan_steps(cfg, tcfg, hbm_budget_bytes=1 << 40)
        assert k == 10
        assert 100 % k == 0

    def test_hbm_budget_caps_k(self):
        from msfno_tpu.training.trainer import (
            auto_scan_steps,
            chunk_input_bytes_per_step,
        )

        cfg = small_cfg()
        tcfg = TrainConfig(batch_size=1, validation_interval=100)
        per = chunk_input_bytes_per_step(cfg, tcfg)
        # budget for exactly 5 batches -> K=5 (a divisor) not 10
        assert auto_scan_steps(cfg, tcfg, hbm_budget_bytes=5 * per) == 5
        # budget below one batch still yields a working K=1
        assert auto_scan_steps(cfg, tcfg, hbm_budget_bytes=1) == 1

    def test_no_validation_interval_uses_cap(self):
        from msfno_tpu.training.trainer import auto_scan_steps

        cfg = small_cfg()
        tcfg = TrainConfig(batch_size=1, validation_interval=0)
        assert auto_scan_steps(cfg, tcfg, hbm_budget_bytes=1 << 40) == 16

    def test_full_size_shapes_respect_budget(self):
        """Full-resolution filmed config: 607 MB per (S=2,B=1) batch means a
        4 GB budget must keep K*607MB under it."""
        from msfno_tpu.training.trainer import (
            auto_scan_steps,
            chunk_input_bytes_per_step,
        )
        from msfno_tpu.utils.config import FilmConfig, SFNOConfig

        cfg = SFNOConfig(film=FilmConfig(film_gen_type="gcn_custom"))
        tcfg = TrainConfig(batch_size=1, validation_interval=100)
        per = chunk_input_bytes_per_step(cfg, tcfg)
        assert per > 500 * 2**20  # ~607 MB
        k = auto_scan_steps(cfg, tcfg, hbm_budget_bytes=4 * 2**30)
        assert k * per <= 4 * 2**30
        assert 100 % k == 0

    def test_cli_auto_flag(self):
        from msfno_tpu.cli import build_parser, configs_from_args

        args = build_parser().parse_args(
            ["--img-size", "16", "32", "--scale-factor", "2", "--in-chans",
             "3", "--out-chans", "3", "--embed-dim", "8", "--num-layers",
             "2", "--spectral-layers", "1", "--scan-steps", "auto",
             "--validation-interval", "100"]
        )
        _, tcfg = configs_from_args(args)
        assert tcfg.scan_steps == 10
        # explicit integers still work
        args = build_parser().parse_args(["--scan-steps", "4"])
        _, tcfg = configs_from_args(args)
        assert tcfg.scan_steps == 4


class TestBatchSizeProbeErrors:
    """test_batch_size only swallows OOM-shaped failures (VERDICT r3 weak
    #7): real bugs propagate instead of shrinking the answer."""

    def test_non_oom_propagates(self, monkeypatch):
        tr = Trainer(small_cfg(), TrainConfig(batch_size=1))

        def boom(b):
            raise ValueError("shape mismatch: not an OOM")

        monkeypatch.setattr(tr, "_probe_batch_size", boom)
        with pytest.raises(ValueError, match="shape mismatch"):
            tr.test_batch_size((1, 2))

    def test_oom_shrinks(self, monkeypatch):
        tr = Trainer(small_cfg(), TrainConfig(batch_size=1))

        def probe(b):
            if b > 2:
                raise RuntimeError(
                    "RESOURCE_EXHAUSTED: Out of memory while trying to "
                    "allocate 123 bytes"
                )

        monkeypatch.setattr(tr, "_probe_batch_size", probe)
        assert tr.test_batch_size((1, 2, 4, 8)) == 2


def test_async_orbax_checkpoint(tmp_path):
    """async_checkpoint=True: the orbax save returns immediately; the tree
    + meta.json are committed after wait_for_async_saves (which
    Trainer.train calls at finalize), and the checkpoint loads."""
    import os

    from msfno_tpu.training import checkpoint as ckpt_io

    tcfg = TrainConfig(batch_size=1, training_epochs=1,
                       validation_interval=0, checkpoint_backend="orbax",
                       async_checkpoint=True)
    tr = Trainer(small_cfg(), tcfg, checkpoint_dir=str(tmp_path))
    state = tr.train(tr.init_state(), num_batches=2)  # finalize drains
    cps = [f for f in os.listdir(tmp_path)
           if f.startswith("checkpoint_")
           and os.path.isdir(os.path.join(tmp_path, f))]
    assert cps
    path = os.path.join(tmp_path, sorted(cps)[-1])
    assert os.path.exists(os.path.join(path, "meta.json"))
    params, _, meta = ckpt_io.load_checkpoint(path)
    assert meta["step"] == 2 and "encoder" in params
    # leaves must come back as HOST numpy arrays (the async snapshot
    # records concrete device shardings; a fresh process/topology cannot
    # resolve them — see _restore_orbax_numpy)
    import numpy as np

    assert isinstance(jax.tree_util.tree_leaves(params)[0], np.ndarray)


def test_orbax_meta_crash_recovery(tmp_path):
    """A hard crash between orbax commit and the deferred meta.json write
    must not orphan the checkpoint: peek/load recover metadata from the
    commit-atomic meta_json leaf inside the payload and re-materialize
    the sidecar (advisor round-4 finding)."""
    import os

    from msfno_tpu.training import checkpoint as ckpt_io

    tcfg = TrainConfig(batch_size=1, training_epochs=1,
                       validation_interval=0, checkpoint_backend="orbax",
                       async_checkpoint=True)
    tr = Trainer(small_cfg(), tcfg, checkpoint_dir=str(tmp_path))
    tr.train(tr.init_state(), num_batches=2)
    cps = [f for f in os.listdir(tmp_path)
           if f.startswith("checkpoint_")
           and os.path.isdir(os.path.join(tmp_path, f))]
    path = os.path.join(tmp_path, sorted(cps)[-1])
    os.remove(os.path.join(path, "meta.json"))  # simulate the crash window
    assert ckpt_io.is_orbax_dir(path)  # orbax markers alone suffice
    meta = ckpt_io.peek(path)
    assert meta["step"] == 2
    assert os.path.exists(os.path.join(path, "meta.json"))  # re-materialized
    params, _, meta2 = ckpt_io.load_checkpoint(path)
    assert meta2["step"] == 2 and "encoder" in params
