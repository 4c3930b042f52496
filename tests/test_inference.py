"""Rollout driver, skill evaluation, and forecast writer tests."""

import jax
import jax.numpy as jnp
import numpy as np

from msfno_tpu.data.normalization import Normalizer
from msfno_tpu.data.synthetic import gen_batch
from msfno_tpu.inference import (
    RolloutConfig,
    evaluate_rollout,
    hourly_climatology,
    rollout,
    scan_rollout,
)
from msfno_tpu.inference.forecast_writer import ForecastWriter
from msfno_tpu.models import FourierNeuralOperatorNet, FourierNeuralOperatorNetFilmed
from tests.test_training import small_cfg


class TestRollout:
    def _model(self, film=False):
        cfg = small_cfg(film=film)
        model = (
            FourierNeuralOperatorNetFilmed(cfg) if film else FourierNeuralOperatorNet(cfg)
        )
        b = gen_batch(cfg, 1, 0, seed=0)
        x0 = jnp.asarray(b.era5[0])
        if film:
            sst = jnp.asarray(b.sst[0])
            params = model.init(jax.random.PRNGKey(0), x0, sst)["params"]
        else:
            params = model.init(jax.random.PRNGKey(0), x0)["params"]
        return cfg, model, params, b

    def test_streaming_rollout(self):
        cfg, model, params, b = self._model(film=False)
        outs = list(
            rollout(
                model,
                params,
                b.era5[0],
                RolloutConfig(steps=3),
            )
        )
        assert len(outs) == 3
        for o in outs:
            assert o.shape == (1, 16, 32, 3)
            assert np.all(np.isfinite(o))

    def test_streaming_rollout_filmed_with_channels(self):
        cfg, model, params, b = self._model(film=True)
        sst_seq = np.stack([b.sst[0]] * 4)
        outs = list(
            rollout(
                model,
                params,
                b.era5[0],
                RolloutConfig(steps=4, collect_channels=[0, 2]),
                sst_seq=sst_seq,
            )
        )
        assert len(outs) == 4
        assert outs[0].shape == (1, 16, 32, 2)

    def test_scan_rollout_matches_streaming(self):
        cfg, model, params, b = self._model(film=False)
        norm = Normalizer.identity(cfg.in_chans)
        stream = list(
            rollout(
                model, params, b.era5[0], RolloutConfig(steps=3, denormalize=False)
            )
        )
        scanned = np.asarray(scan_rollout(model, params, b.era5[0], 3))
        np.testing.assert_allclose(
            scanned, np.stack(stream), rtol=2e-4, atol=1e-4
        )

    def test_denormalize(self):
        cfg, model, params, b = self._model(film=False)
        norm = Normalizer(
            means=np.asarray([1.0, 2.0, 3.0], np.float32),
            stds=np.asarray([2.0, 2.0, 2.0], np.float32),
        )
        raw = list(
            rollout(
                model, params, b.era5[0],
                RolloutConfig(steps=1, denormalize=False), normalizer=norm,
            )
        )[0]
        den = list(
            rollout(
                model, params, b.era5[0],
                RolloutConfig(steps=1, denormalize=True), normalizer=norm,
            )
        )[0]
        np.testing.assert_allclose(den, raw * 2.0 + np.asarray([1, 2, 3]), rtol=1e-5)


class TestEvaluate:
    def test_perfect_forecast_skill_one(self):
        s, b, h, w, c = 2, 1, 8, 16, 3
        tar = np.random.randn(s, b, h, w, c).astype(np.float32)
        clim = np.zeros((h, w, c), np.float32)
        rep = evaluate_rollout(tar, tar, clim)
        np.testing.assert_allclose(rep.skill, 1.0, atol=1e-6)
        np.testing.assert_allclose(rep.mse_model, 0.0, atol=1e-10)

    def test_climatology_forecast_skill_zero(self):
        s, b, h, w, c = 2, 1, 8, 16, 3
        tar = np.random.randn(s, b, h, w, c).astype(np.float32)
        clim = np.zeros((h, w, c), np.float32)
        fc = np.broadcast_to(clim, tar.shape).copy()
        rep = evaluate_rollout(fc, tar, clim)
        np.testing.assert_allclose(rep.skill, 0.0, atol=1e-5)

    def test_hourly_climatology(self):
        n, h, w, c = 8, 4, 8, 2
        fields = np.ones((n, h, w, c), np.float32)
        doy = np.asarray([1, 1, 2, 2, 1, 1, 2, 2])
        hour = np.asarray([0, 6, 0, 6, 0, 6, 0, 6])
        clim = hourly_climatology(fields, doy, hour)
        assert clim.shape == (366, 4, h, w, c)
        np.testing.assert_allclose(clim[0, 0], 1.0)


class TestForecastWriter:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "fc")
        w = ForecastWriter(
            path, ["t2m", "u10"], np.linspace(90, -90, 4), np.linspace(0, 360, 8)
        )
        a = np.random.randn(3, 4, 8, 2).astype(np.float32)
        b = np.random.randn(3, 4, 8, 2).astype(np.float32)
        w.append(2020010100, a)
        w.append(2020010106, b)
        meta, data = ForecastWriter.read(path)
        assert meta["times"] == [2020010100, 2020010106]
        assert data.shape == (3, 2, 4, 8, 2)
        np.testing.assert_array_equal(data[:, 0], a)


class TestACC:
    """Anomaly correlation coefficient (additional to the reference's
    MSE/skill; ECMWF deterministic-verification definition)."""

    def test_perfect_forecast_acc_one(self):
        import numpy as np

        from msfno_tpu.inference.evaluate import evaluate_rollout

        rng = np.random.default_rng(0)
        tar = rng.standard_normal((2, 1, 8, 16, 3)).astype(np.float32)
        clim = rng.standard_normal((8, 16, 3)).astype(np.float32)
        rep = evaluate_rollout(tar.copy(), tar, clim)
        np.testing.assert_allclose(rep.acc, 1.0, atol=1e-5)

    def test_climatology_forecast_acc_zero_mean(self):
        """Forecasting pure climatology gives zero anomaly -> ACC 0/den
        ~ 0; an anti-correlated forecast gives ACC ~ -1."""
        import numpy as np

        from msfno_tpu.inference.evaluate import evaluate_rollout, weighted_acc

        rng = np.random.default_rng(1)
        clim = rng.standard_normal((8, 16, 3)).astype(np.float32)
        tar = clim + rng.standard_normal((1, 1, 8, 16, 3)).astype(np.float32)
        anti = clim - (tar - clim)  # mirrored anomaly
        acc = weighted_acc(anti[0], tar[0], clim)
        np.testing.assert_allclose(acc, -1.0, atol=1e-5)

    def test_matches_numpy_reference(self):
        """ACC against a hand-rolled unweighted computation on a uniform
        1-row grid (lat weights collapse to a constant)."""
        import numpy as np

        from msfno_tpu.inference.evaluate import weighted_acc

        rng = np.random.default_rng(2)
        pred = rng.standard_normal((2, 1, 16, 3)).astype(np.float32)
        tar = rng.standard_normal((2, 1, 16, 3)).astype(np.float32)
        clim = rng.standard_normal((1, 16, 3)).astype(np.float32)
        got = weighted_acc(pred, tar, np.broadcast_to(clim, pred.shape))
        fp = (pred - clim).reshape(-1, 3)
        tp = (tar - clim).reshape(-1, 3)
        want = (fp * tp).sum(0) / np.sqrt(
            (fp**2).sum(0) * (tp**2).sum(0)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_saved_artifact(self, tmp_path):
        import numpy as np

        from msfno_tpu.inference.evaluate import evaluate_rollout

        rng = np.random.default_rng(3)
        tar = rng.standard_normal((1, 1, 8, 16, 3)).astype(np.float32)
        rep = evaluate_rollout(tar * 0.9, tar, tar.mean(axis=(0, 1)))
        rep.save(str(tmp_path / "r"))
        assert (tmp_path / "r_acc.npy").exists()
