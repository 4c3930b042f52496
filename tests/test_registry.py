"""Registry, wrappers, converter, and SST/ONI helper tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msfno_tpu.data.sst import compute_oni, coarsen, nino34_mask
from msfno_tpu.models import get_model
from msfno_tpu.models.convert import convert_sfno_state_dict
from msfno_tpu.models.variables import ORDERING, channel_index
from msfno_tpu.utils.config import FilmConfig, SFNOConfig
from tests.test_training import small_cfg


class TestVariables:
    def test_73_channels(self):
        assert len(ORDERING) == 73
        assert ORDERING[0] == "10u"
        assert channel_index("2t") == 4
        assert ORDERING[8] == "u50"
        assert ORDERING[-1] == "r1000"


class TestRegistry:
    def test_sfno_wrapper(self):
        w = get_model("sfno", cfg=small_cfg(film=False))
        p = w.init_params()
        assert "encoder" in p and "decoder" in p

    def test_filmed_wrapper_get_parameters(self):
        w = get_model("sfno", "film", cfg=small_cfg(film=True))
        w.init_params()
        t = w.get_parameters()
        assert set(t) == {"film_gen"}

    def test_fcn_wrapper(self):
        from msfno_tpu.models.registry_fcn import fcn_config

        cfg = fcn_config(20)
        cfg = SFNOConfig(
            **{
                **{f.name: getattr(cfg, f.name) for f in cfg.__dataclass_fields__.values()},
                "img_size": (16, 32),
                "scale_factor": 4,
                "embed_dim": 16,
                "num_layers": 1,
            }
        )
        w = get_model("fcn", "0", cfg=cfg)
        p = w.init_params()
        assert w.ordering[0] == "10u"
        x = jnp.zeros((1, 16, 32, 20))
        y = w.module.apply({"params": p}, x)
        assert y.shape == (1, 16, 32, 20)

    def test_mae_wrapper_loss(self):
        cfg = small_cfg(film=True)
        w = get_model("mae", cfg=cfg)
        p = w.init_params()
        f = cfg.film
        sst = np.random.randn(2, f.temporal_step, *f.sst_shape).astype(np.float32)
        sst[:, :, :2, :3] = np.nan
        loss = float(w.loss(p, jnp.asarray(sst), 0.5, jax.random.PRNGKey(0)))
        assert np.isfinite(loss)

    def test_lin_probe_fit(self):
        cfg = small_cfg(film=True)
        w = get_model("mae", "lin-probe", cfg=cfg)
        rng = np.random.default_rng(0)
        # exact linear relationship must be recovered
        x = rng.standard_normal((64, cfg.film.embed_dim)).astype(np.float32)
        beta = rng.standard_normal(cfg.film.embed_dim).astype(np.float32)
        y = x @ beta + 0.5
        w.fit(x, y, l2=1e-8)
        assert w.mae_metric(x, y) < 1e-3

    def test_running_yields_fields(self):
        w = get_model("sfno", cfg=small_cfg(film=False))
        w.init_params()
        x0 = np.random.randn(1, 16, 32, 3).astype(np.float32)
        outs = list(w.running(x0, lead_time_h=12))
        assert len(outs) == 2

    def test_running_uses_checkpoint_film_scale(self, tmp_path):
        """Inference must modulate at the TRAINED film strength: load_model
        picks up meta['film_scale'] and running() forwards it (regression:
        scale was hardcoded to 1.0, over-modulating partially ramped
        checkpoints)."""
        import jax.numpy as jnp

        from msfno_tpu.training import checkpoint as ckpt_io

        cfg = small_cfg(film=True)
        w = get_model("sfno", "film", cfg=cfg)
        params = w.init_params()
        cp = str(tmp_path / "cp.npz")
        ckpt_io.save_checkpoint(cp, params, step=1, epoch=0,
                                extra={"film_scale": 0.25})
        w2 = get_model("sfno", "film", cfg=cfg)
        w2.load_model(cp)
        assert w2.film_scale == 0.25

        f = cfg.film
        x0 = np.random.randn(1, 16, 32, 3).astype(np.float32)
        sst = np.random.randn(
            3, 1, f.temporal_step, *f.sst_shape
        ).astype(np.float32)
        out_ckpt = list(w2.running(x0, lead_time_h=6, sst_seq=sst))[0]
        # manual rollout at the stored scale must match; at scale 1.0 it
        # must differ (the modulation is active for this random film gen)
        from msfno_tpu.inference.rollout import rollout, RolloutConfig

        ref = list(rollout(w2.module, w2.params, x0, RolloutConfig(steps=1),
                           sst_seq=sst, normalizer=w2.normalizer,
                           sst_normalizer=w2.sst_normalizer, scale=0.25))[0]
        full = list(rollout(w2.module, w2.params, x0, RolloutConfig(steps=1),
                            sst_seq=sst, normalizer=w2.normalizer,
                            sst_normalizer=w2.sst_normalizer, scale=1.0))[0]
        np.testing.assert_allclose(out_ckpt, ref, rtol=1e-5, atol=1e-5)
        assert not np.allclose(ref, full)


class TestConverter:
    def test_sfno_state_dict_conversion(self):
        """Build a fake reference-layout torch-style state dict and check the
        converted tree loads into the flax model."""
        cfg = small_cfg(film=False)
        w = get_model("sfno", cfg=cfg)
        p = w.init_params()

        rng = np.random.default_rng(0)
        e, h, wdt = cfg.embed_dim, *cfg.img_size
        sd = {
            "module.pos_embed": rng.standard_normal((1, e, h, wdt)).astype(np.float32),
            "module.encoder.fwd.0.weight": rng.standard_normal(
                (e, cfg.in_chans, 1, 1)
            ).astype(np.float32),
            "module.encoder.fwd.0.bias": np.zeros(e, np.float32),
            "module.encoder.fwd.2.weight": rng.standard_normal((e, e, 1, 1)).astype(
                np.float32
            ),
            "module.norm.weight": np.ones(3, np.float32),  # dead key, dropped
            "module.blocks.0.norm0.weight": np.ones(e, np.float32),
            "module.blocks.0.norm0.bias": np.zeros(e, np.float32),
            "module.blocks.0.filter_layer.filter.w.0": rng.standard_normal(
                (e, 2 * e, 2)
            ).astype(np.float32),
            "module.blocks.0.filter_layer.filter.wout": rng.standard_normal(
                (2 * e, e, 2)
            ).astype(np.float32),
            "module.blocks.1.inner_skip.weight": rng.standard_normal(
                (e, e, 1, 1)
            ).astype(np.float32),
            "module.blocks.1.inner_skip.bias": np.zeros(e, np.float32),
            "module.blocks.1.mlp.fwd.0.weight": rng.standard_normal(
                (2 * e, e, 1, 1)
            ).astype(np.float32),
            "module.blocks.1.mlp.fwd.0.bias": np.zeros(2 * e, np.float32),
            "module.blocks.1.mlp.fwd.2.weight": rng.standard_normal(
                (e, 2 * e, 1, 1)
            ).astype(np.float32),
            "module.trans_down.weights": np.zeros((3, 3), np.float32),  # buffer
        }
        out = convert_sfno_state_dict(sd, num_layers=cfg.num_layers)
        assert out["unconverted"] == []
        cp = out["params"]
        assert cp["pos_embed"].shape == (h, wdt, e)
        assert cp["encoder"]["fc1"]["kernel"].shape == (cfg.in_chans, e)
        assert cp["blocks_0"]["filter"]["w0"].shape == (e, 2 * e, 2)
        assert cp["blocks_1"]["mlp"]["fc1"]["kernel"].shape == (e, 2 * e)
        # kernel transpose correctness: torch (out,in,1,1) -> flax (in,out)
        np.testing.assert_array_equal(
            cp["encoder"]["fc1"]["kernel"],
            sd["module.encoder.fwd.0.weight"][:, :, 0, 0].T,
        )

    def test_spectral_conv_transpose(self):
        sd = {"blocks.0.filter_layer.filter.w": np.arange(2 * 3 * 4 * 2).reshape(
            2, 3, 4, 2
        ).astype(np.float32)}
        out = convert_sfno_state_dict(sd, num_layers=1)
        w = out["params"]["blocks_0"]["filter"]["w"]
        assert w.shape == (4, 3, 2, 2)
        np.testing.assert_array_equal(
            w[1, 2, 0], sd["blocks.0.filter_layer.filter.w"][0, 2, 1]
        )


class TestSST:
    def test_coarsen_nan_aware(self):
        x = np.ones((8, 8), np.float32)
        x[0, 0] = np.nan
        y = coarsen(x, 4)
        assert y.shape == (2, 2)
        np.testing.assert_allclose(y, 1.0)  # nanmean ignores single NaN

    def test_nino34_box(self):
        lat = np.linspace(90, -90, 181)
        lon = np.linspace(0, 359, 360)
        m = nino34_mask(lat, lon)
        assert m.sum() == 11 * 51  # 5S..5N x 170W..120W at 1 degree

    def test_oni_recovers_anomaly(self):
        lat = np.linspace(90, -90, 181)
        lon = np.linspace(0, 359, 360)
        n = 40
        # each day-of-year occurs twice so the climatology is the mean of the
        # two years and the warm second year shows a positive anomaly
        doy = np.tile(np.arange(1, n // 2 + 1), 2)
        sst = np.zeros((n, 181, 360), np.float32)
        sst[n // 2 :] += 2.0  # warm anomaly in the second year
        oni = compute_oni(sst, doy, lat, lon, smooth_days=1)
        assert oni.shape == (n,)
        assert oni[-1] > oni[0]


class TestTorchCheckpointIngestion:
    def test_torch_save_roundtrip(self, tmp_path):
        """A reference-layout torch checkpoint (torch.save) loads through
        load_ecmwf_weights_tar into flax params."""
        import torch

        from msfno_tpu.models.convert import load_ecmwf_weights_tar

        e = 8
        sd = {
            "module.pos_embed": torch.randn(1, e, 8, 16),
            "module.encoder.fwd.0.weight": torch.randn(e, 3, 1, 1),
            "module.encoder.fwd.0.bias": torch.zeros(e),
            "module.encoder.fwd.2.weight": torch.randn(e, e, 1, 1),
            "module.blocks.0.filter_layer.filter.w.0": torch.randn(e, 2 * e, 2),
            "module.blocks.0.filter_layer.filter.wout": torch.randn(2 * e, e, 2),
        }
        path = str(tmp_path / "weights.tar")
        torch.save({"model_state": sd}, path)
        out = load_ecmwf_weights_tar(path, num_layers=1)
        assert out["unconverted"] == []
        p = out["params"]
        assert p["pos_embed"].shape == (8, 16, e)
        np.testing.assert_allclose(
            p["encoder"]["fc1"]["kernel"],
            sd["module.encoder.fwd.0.weight"].numpy()[:, :, 0, 0].T,
        )


class TestMAEStochasticMask:
    def test_dynamic_equals_static_mask(self):
        """The traced-ratio (attention-masked) path is numerically identical
        to the gather path at the same ratio/rng — so the reference's
        per-batch U(0.4, 0.8) sampling (train.py:334) costs no fidelity."""
        from msfno_tpu.models.film.mae import ContextCast

        m = ContextCast(patch_size=(4, 4, 4), encoder_dim=32, decoder_dim=32,
                        encoder_depth=2, decoder_depth=1, heads=4)
        sst = np.random.default_rng(0).standard_normal((2, 4, 16, 32)).astype(
            np.float32
        )
        sst[:, :, :4, :6] = np.nan
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(sst))["params"]
        rng = jax.random.PRNGKey(3)
        (sm, ss), (lm_s, _), cls_s, _ = m.apply(
            {"params": params}, jnp.asarray(sst), mask_ratio=0.5, rng=rng
        )
        (dm, ds), (lm_d, _), cls_d, _ = m.apply(
            {"params": params}, jnp.asarray(sst),
            mask_ratio=jnp.asarray(0.5), rng=rng,
        )
        np.testing.assert_array_equal(np.asarray(lm_s), np.asarray(lm_d))
        np.testing.assert_allclose(np.asarray(sm), np.asarray(dm), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ss), np.asarray(ds), atol=1e-5)
        np.testing.assert_allclose(np.asarray(cls_s), np.asarray(cls_d),
                                   atol=1e-5)

    def test_stochastic_train_step_updates(self):
        import optax

        cfg = small_cfg(film=True)
        w = get_model("mae", cfg=cfg)
        p0 = w.init_params()
        tx = optax.adam(1e-3)
        st = tx.init(p0)
        step = w.make_train_step(tx)
        f = cfg.film
        sst = np.random.default_rng(1).standard_normal(
            (2, f.temporal_step, *f.sst_shape)
        ).astype(np.float32)
        p1, st, l1 = step(p0, st, jnp.asarray(sst), jax.random.PRNGKey(1))
        p2, st, l2 = step(p1, st, jnp.asarray(sst), jax.random.PRNGKey(2))
        assert np.isfinite(float(l1)) and np.isfinite(float(l2))
        a = jax.tree_util.tree_leaves(p0)[0]
        b = jax.tree_util.tree_leaves(p2)[0]
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 0
        # different rngs draw different ratios -> different losses
        _, _, l1b = step(p0, tx.init(p0), jnp.asarray(sst), jax.random.PRNGKey(9))
        assert float(l1b) != float(l1)

    def test_pretrain_driver(self):
        cfg = small_cfg(film=True)
        w = get_model("mae", cfg=cfg)
        f = cfg.film
        rng = np.random.default_rng(2)
        batches = [
            rng.standard_normal((2, f.temporal_step, *f.sst_shape)).astype(
                np.float32
            )
            for _ in range(3)
        ]
        params, losses = w.pretrain(batches, learning_rate=1e-3, seed=0)
        assert len(losses) == 3 and all(np.isfinite(l) for l in losses)


class TestMAEOniDemo:
    def test_probe_beats_climatology(self):
        """Miniature of examples/mae_oni_demo.py: MAE cls -> ridge probe must
        beat the day-of-year-climatology ONI baseline (the reference's
        LinearProbingMAE yardstick: 0.25-0.40 vs 0.628)."""
        import sys, os

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from examples.mae_oni_demo import run

        res = run(steps=10, n_days=240, seed=0)
        assert np.isfinite(res["model_mae"])
        assert res["model_mae"] < res["climatology_mae"]


def test_fcn_orderings_match_reference():
    """Channel orderings verbatim from the reference
    (fourcastnet/model.py:266-287 and 309-336) — NOT sfc-then-pl; a wrong
    ordering mislabels every channel of the forecast archive."""
    from msfno_tpu.models.registry_fcn import FCN0_ORDERING, FCN1_ORDERING

    assert FCN0_ORDERING == [
        "10u", "10v", "2t", "sp", "msl", "t850",
        "u1000", "v1000", "z1000", "u850", "v850", "z850",
        "u500", "v500", "z500", "t500", "z50", "r500", "r850", "tcwv",
    ]
    assert FCN1_ORDERING == FCN0_ORDERING + [
        "100u", "100v", "u250", "v250", "z250", "t250",
    ]
    assert len(FCN0_ORDERING) == 20 and len(FCN1_ORDERING) == 26
