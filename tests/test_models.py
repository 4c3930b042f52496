"""Model-level tests: SFNO + filmed SFNO forward shapes, FiLM semantics,
all film-generator variants, and the filter/transform matrix."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msfno_tpu.models import FourierNeuralOperatorNet, FourierNeuralOperatorNetFilmed
from msfno_tpu.models.film.wrapper import FilmWrapper
from msfno_tpu.utils.config import FilmConfig, SFNOConfig, tiny_sfno


def _small_cfg(**kw):
    base = dict(
        img_size=(32, 64),
        scale_factor=2,
        in_chans=4,
        out_chans=4,
        embed_dim=16,
        num_layers=3,
        spectral_layers=2,
    )
    base.update(kw)
    return SFNOConfig(**base)


def _sst(key, b=1, t=4, h=16, w=32, nan_frac=0.3):
    sst = jax.random.normal(key, (b, t, h, w))
    land = jax.random.uniform(jax.random.PRNGKey(7), (h, w)) < nan_frac
    return jnp.where(land[None, None], jnp.nan, sst)


class TestSFNO:
    def test_forward_shape(self):
        cfg = _small_cfg()
        model = FourierNeuralOperatorNet(cfg)
        x = jnp.ones((2, 32, 64, 4))
        params = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(params, x)
        assert y.shape == (2, 32, 64, 4)
        assert np.all(np.isfinite(np.asarray(y)))

    def test_jit_forward(self):
        cfg = _small_cfg()
        model = FourierNeuralOperatorNet(cfg)
        x = jnp.ones((1, 32, 64, 4))
        params = model.init(jax.random.PRNGKey(0), x)
        y = jax.jit(model.apply)(params, x)
        assert y.shape == (1, 32, 64, 4)

    @pytest.mark.parametrize(
        "filter_type,transform",
        [
            ("non-linear", "sht"),
            ("linear", "sht"),
            ("non-linear", "fft"),
            ("linear", "fft"),
        ],
    )
    def test_filter_matrix(self, filter_type, transform):
        cfg = _small_cfg(filter_type=filter_type, spectral_transform=transform)
        model = FourierNeuralOperatorNet(cfg)
        x = jnp.ones((1, 32, 64, 4))
        params = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(params, x)
        assert y.shape == (1, 32, 64, 4)
        assert np.all(np.isfinite(np.asarray(y)))

    def test_tt_compression(self):
        cfg = _small_cfg(filter_type="linear", compression="tt", rank=4)
        model = FourierNeuralOperatorNet(cfg)
        x = jnp.ones((1, 32, 64, 4))
        params = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(params, x)
        assert np.all(np.isfinite(np.asarray(y)))

    def test_layer_norm_variant(self):
        cfg = _small_cfg(normalization_layer="layer_norm")
        model = FourierNeuralOperatorNet(cfg)
        x = jnp.ones((1, 32, 64, 4))
        params = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(params, x)
        assert np.all(np.isfinite(np.asarray(y)))

    def test_bf16_compute(self):
        cfg = _small_cfg(compute_dtype="bfloat16")
        model = FourierNeuralOperatorNet(cfg)
        x = jnp.ones((1, 32, 64, 4))
        params = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(params, x)
        assert y.dtype == jnp.float32  # output cast back
        assert np.all(np.isfinite(np.asarray(y)))

    def test_fused_norm_matches_unfused(self):
        # fuse_norm_sht folds each block's instance-norm into the forward
        # SHT via SHT(a*x+b) = a*SHT(x) + b*SHT(1); must be an exact
        # rewrite (linear algebra, no approximation)
        cfg = _small_cfg(fuse_norm_sht=True)
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 64, 4))
        m1 = FourierNeuralOperatorNet(cfg)
        params = m1.init(jax.random.PRNGKey(0), x)
        y1 = m1.apply(params, x)
        m2 = FourierNeuralOperatorNet(
            dataclasses.replace(cfg, fuse_norm_sht=False)
        )
        y2 = m2.apply(params, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-5)

    def test_remat_matches(self):
        cfg = _small_cfg()
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 64, 4))
        m1 = FourierNeuralOperatorNet(cfg)
        params = m1.init(jax.random.PRNGKey(0), x)
        y1 = m1.apply(params, x)
        m2 = FourierNeuralOperatorNet(
            dataclasses.replace(cfg, checkpointing_block=True)
        )
        y2 = m2.apply(params, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def _film_cfg(kind, **kw):
    base = dict(
        film_gen_type=kind,
        film_layers=1,
        model_depth=2,
        embed_dim=32,
        mlp_dim=32,
        num_film_features=16,
        sst_shape=(16, 32),
        patch_size=(4, 4, 4),
        temporal_step=4,
    )
    base.update(kw)
    return FilmConfig(**base)


class TestFilmGenerators:
    @pytest.mark.parametrize("kind", ["gcn_custom", "gcn", "transformer", "mae"])
    def test_output_shape(self, kind):
        cfg = _film_cfg(kind)
        sst = _sst(jax.random.PRNGKey(1))
        wrapper = FilmWrapper(cfg)
        params = wrapper.init(jax.random.PRNGKey(0), sst)
        out = wrapper.apply(params, sst)
        assert out.shape == (1, 2, 1, 16)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_zero_init_heads_give_zero_film(self):
        """gcn/transformer heads are zero-initialized (vit.py:212-214,
        gcn/gcn.py:26-28) -> gamma = beta = 0 at init."""
        for kind in ["gcn", "transformer"]:
            cfg = _film_cfg(kind)
            sst = _sst(jax.random.PRNGKey(1))
            wrapper = FilmWrapper(cfg)
            params = wrapper.init(jax.random.PRNGKey(0), sst)
            out = wrapper.apply(params, sst)
            np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


class TestFilmedSFNO:
    def _setup(self, **film_kw):
        cfg = _small_cfg(film=_film_cfg("gcn_custom", **film_kw))
        model = FourierNeuralOperatorNetFilmed(cfg)
        x = jnp.ones((1, 32, 64, 4))
        sst = _sst(jax.random.PRNGKey(2))
        params = model.init(jax.random.PRNGKey(0), x, sst)
        return model, params, x, sst

    def test_forward_shape(self):
        model, params, x, sst = self._setup(num_film_features=16)
        y = model.apply(params, x, sst, 1.0)
        assert y.shape == (1, 32, 64, 4)
        assert np.all(np.isfinite(np.asarray(y)))

    def test_scale_zero_matches_backbone(self):
        """scale=0 turns FiLM off: filmed net == plain SFNO with the shared
        backbone params (reference --eval-sfno path, sfno/model.py:1346-1354)."""
        model, params, x, sst = self._setup(num_film_features=16)
        y0 = model.apply(params, x, sst, 0.0)
        plain = FourierNeuralOperatorNet(model.cfg)
        backbone = {
            "params": {
                k: v for k, v in params["params"].items() if k != "film_gen"
            }
        }
        y_plain = plain.apply(backbone, x)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y_plain), atol=1e-5)

    def test_scale_changes_output(self):
        model, params, x, sst = self._setup(num_film_features=16)
        y0 = model.apply(params, x, sst, 0.0)
        y1 = model.apply(params, x, sst, 1.0)
        # gcn_custom head weights init to ones (gcn/gcn.py:137-139) -> nonzero film
        assert np.abs(np.asarray(y1 - y0)).max() > 1e-6

    def test_repeat_film(self):
        model, params, x, sst = self._setup(num_film_features=16, repeat_film=True)
        y = model.apply(params, x, sst, 1.0)
        assert np.all(np.isfinite(np.asarray(y)))

    def test_film_gradient_flows(self):
        model, params, x, sst = self._setup(num_film_features=16)

        def loss(p):
            return jnp.sum(model.apply(p, x, sst, 1.0) ** 2)

        g = jax.grad(loss)(params)
        gfilm = jax.tree_util.tree_leaves(g["params"]["film_gen"])
        total = sum(float(jnp.sum(jnp.abs(t))) for t in gfilm)
        assert np.isfinite(total) and total > 0


def test_checkpointing_encoder_decoder_match():
    """remat'd encoder/decoder produce identical outputs."""
    cfg = _small_cfg()
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 64, 4))
    m1 = FourierNeuralOperatorNet(cfg)
    params = m1.init(jax.random.PRNGKey(0), x)
    y1 = m1.apply(params, x)
    m2 = FourierNeuralOperatorNet(
        dataclasses.replace(cfg, checkpointing_encoder=True, checkpointing_decoder=True)
    )
    y2 = m2.apply(params, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)

    def loss(p):
        return jnp.sum(m2.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    assert np.isfinite(
        sum(float(jnp.sum(jnp.abs(t))) for t in jax.tree_util.tree_leaves(g))
    )


def test_mae_cls_input_film():
    """Precomputed-cls film path (reference cfg.cls, sfnonet.py:900-907)."""
    cfg = _film_cfg("mae", cls_input=True)
    cls = jax.random.normal(jax.random.PRNGKey(0), (2, cfg.embed_dim))
    wrapper = FilmWrapper(cfg)
    params = wrapper.init(jax.random.PRNGKey(1), cls)
    out = wrapper.apply(params, cls)
    assert out.shape == (2, 2, 1, 16)
    # only the film head is parameterized (MAE backbone not instantiated)
    assert set(params["params"]) == {"film_head"}


def test_neighbor_sum_semantics():
    """neighbor_sum == explicit 8-neighbor shifts (periodic lon, zero-pole)."""
    from msfno_tpu.models.film.gcn import neighbor_sum

    v = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (2, 8, 12, 3)))
    ref = np.zeros_like(v)
    h = v.shape[1]
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            if di == 0 and dj == 0:
                continue
            shifted = np.roll(v, dj, axis=2)  # periodic longitude
            if di == 1:
                shifted = np.concatenate(
                    [np.zeros_like(shifted[:, :1]), shifted[:, :-1]], axis=1
                )
            elif di == -1:
                shifted = np.concatenate(
                    [shifted[:, 1:], np.zeros_like(shifted[:, :1])], axis=1
                )
            ref += shifted
    np.testing.assert_allclose(
        np.asarray(neighbor_sum(jnp.asarray(v))), ref, atol=1e-5
    )


def test_film_wrapper_unknown_kind_raises():
    """'none'/None fall back to gcn_custom (reference main.py:130-134), but
    a genuinely unknown generator type must raise, not silently train
    gcn_custom."""
    import dataclasses

    import pytest as _pytest

    from msfno_tpu.models.film.wrapper import FilmWrapper
    from msfno_tpu.utils.config import FilmConfig

    base = FilmConfig(film_gen_type="typo_gen", model_depth=1, embed_dim=8,
                      mlp_dim=8, num_film_features=8, sst_shape=(8, 16),
                      temporal_step=2)
    sst = jnp.zeros((1, 2, 8, 16))
    with _pytest.raises(ValueError, match="unknown film_gen_type"):
        FilmWrapper(base).init(jax.random.PRNGKey(0), sst)
    ok = dataclasses.replace(base, film_gen_type="none")
    FilmWrapper(ok).init(jax.random.PRNGKey(0), sst)  # gcn_custom default


def test_mae_masking_without_rng_raises():
    """mask_ratio > 0 with no rng must raise: the old silent PRNGKey(0)
    fallback froze one mask pattern across all of pretraining."""
    import pytest as _pytest

    from msfno_tpu.models.film.mae import ContextCast

    m = ContextCast(patch_size=(2, 2, 2), encoder_dim=16, decoder_dim=16)
    sst = jnp.zeros((1, 2, 4, 4))
    with _pytest.raises(ValueError, match="requires an explicit rng"):
        m.init(jax.random.PRNGKey(0), sst, mask_ratio=0.5)
    m.init(jax.random.PRNGKey(0), sst, mask_ratio=0.0)  # inference path ok
