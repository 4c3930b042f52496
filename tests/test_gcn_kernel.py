"""Fused GCN-layer kernel (ops/pallas/gcn_layer.py), interpret mode on CPU:
kernel vs the band-matmul reference (incl. pole/wrap stencil edges and the
row-carry lag machinery), gradients, and the fused generator inside the
filmed model (param tree + output parity + film gradient flow)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msfno_tpu.ops.pallas.gcn_layer import _ref_gcn_layer, gcn_layer


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape)


def _mk(b=1, h=12, w=16, c_in=8, f=16, seed=0):
    x = _rand(seed, (b, h, w, c_in))
    mask = (_rand(seed + 1, (b, h, w, 1)) > -0.3).astype(jnp.float32)
    # a plausible dinv: rsqrt of 1 + neighbor count (any positive field works
    # for parity purposes)
    dinv = 1.0 / jnp.sqrt(1.0 + 8.0 * mask)
    w_k = 0.3 * _rand(seed + 2, (c_in, f))
    b_k = 0.1 * _rand(seed + 3, (f,))
    return x, mask, dinv, w_k, b_k


class TestGcnLayerKernel:
    @pytest.mark.parametrize("h,tile_note", [(12, "h=12 tiles"), (7, "h=7 odd")])
    def test_matches_reference(self, h, tile_note):
        x, mask, dinv, w_k, b_k = _mk(h=h)
        y = gcn_layer(x, w_k, b_k, dinv, mask, mxu_dtype="float32")
        ops = dict(x=x, w=w_k, b=b_k, dinv=dinv, mask=mask)
        y_ref = _ref_gcn_layer(ops)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-5
        )

    def test_residual_and_batch(self):
        x, mask, dinv, w_k, b_k = _mk(b=2, h=10, c_in=16, f=16)
        res = _rand(9, (2, 10, 16, 16))
        y = gcn_layer(x, w_k, b_k, dinv, mask, residual=res,
                      mxu_dtype="float32")
        ops = dict(x=x, w=w_k, b=b_k, dinv=dinv, mask=mask, res=res)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(_ref_gcn_layer(ops)),
            rtol=1e-4, atol=1e-5,
        )

    def test_scalar_input_channel(self):
        """conv1 of gcn_custom: C_in=1 runs as a lane broadcast."""
        x, mask, dinv, w_k, b_k = _mk(c_in=1, f=16)
        y = gcn_layer(x, w_k, b_k, dinv, mask, mxu_dtype="float32")
        ops = dict(x=x, w=w_k, b=b_k, dinv=dinv, mask=mask)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(_ref_gcn_layer(ops)),
            rtol=1e-4, atol=1e-5,
        )

    def test_pole_rows_see_zero(self):
        """The first/last latitude rows must use zero neighbors beyond the
        poles — an all-ones field exposes any wraparound."""
        b, h, w, f = 1, 8, 16, 8
        x = jnp.ones((b, h, w, f))
        mask = jnp.ones((b, h, w, 1))
        dinv = jnp.ones((b, h, w, 1))
        w_k = jnp.eye(f)
        b_k = jnp.zeros((f,))
        y = gcn_layer(x, w_k, b_k, dinv, mask, mxu_dtype="float32")
        # interior rows: 9 neighbors; pole rows: 6
        np.testing.assert_allclose(np.asarray(y[0, 0]), 6.0, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(y[0, -1]), 6.0, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(y[0, 3]), 9.0, rtol=1e-5)

    def test_gradients_match_reference(self):
        x, mask, dinv, w_k, b_k = _mk(h=6, w=8, c_in=4, f=8)
        res = _rand(7, (1, 6, 8, 8))

        def loss_k(x, w, b, res):
            y = gcn_layer(x, w, b, dinv, mask, residual=res,
                          mxu_dtype="float32")
            return jnp.sum(y ** 2)

        def loss_r(x, w, b, res):
            y = _ref_gcn_layer(dict(x=x, w=w, b=b, dinv=dinv, mask=mask,
                                    res=res))
            return jnp.sum(y ** 2)

        gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(x, w_k, b_k, res)
        gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(x, w_k, b_k, res)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            )


class TestFusedGeneratorInModel:
    def _sst(self, key, b, t, h, w):
        v = _rand(key, (b, t, h, w))
        land = _rand(key + 1, (1, 1, h, w)) > 1.0
        return jnp.where(jnp.broadcast_to(land, v.shape), jnp.nan, v)

    def test_generator_fused_vs_unfused(self):
        from msfno_tpu.models.film.gcn import GCNFilmGenerator

        sst = self._sst(0, 2, 3, 12, 16)
        g_off = GCNFilmGenerator(10, embed_dim=16, depth=2, use_pallas=False)
        g_on = GCNFilmGenerator(10, embed_dim=16, depth=2, use_pallas=True)
        params = g_off.init(jax.random.PRNGKey(1), sst)
        params_on = g_on.init(jax.random.PRNGKey(1), sst)
        assert jax.tree_util.tree_structure(params_on) == (
            jax.tree_util.tree_structure(params)
        )
        y_off = g_off.apply(params, sst)
        y_on = g_on.apply(params, sst)
        np.testing.assert_allclose(
            np.asarray(y_on), np.asarray(y_off), rtol=1e-4, atol=1e-5
        )

    def test_generator_gcn_variant(self):
        """custom=False: the temporal window is the node feature set."""
        from msfno_tpu.models.film.gcn import GCNFilmGenerator

        sst = self._sst(3, 1, 4, 8, 16)
        g_off = GCNFilmGenerator(6, embed_dim=8, depth=1, custom=False,
                                 use_pallas=False)
        g_on = GCNFilmGenerator(6, embed_dim=8, depth=1, custom=False,
                                use_pallas=True)
        params = g_off.init(jax.random.PRNGKey(1), sst)
        np.testing.assert_allclose(
            np.asarray(g_on.apply(params, sst)),
            np.asarray(g_off.apply(params, sst)),
            rtol=1e-4, atol=1e-5,
        )

    def test_filmed_model_and_grads(self):
        """End-to-end: filmed net with pallas_gcn on/off agrees, and film
        gradients (the fine-tuning surface) match."""
        from msfno_tpu.models import FourierNeuralOperatorNetFilmed
        from tests.test_training import small_cfg

        cfg_off = small_cfg(film=True)
        cfg_off = dataclasses.replace(
            cfg_off,
            film=dataclasses.replace(cfg_off.film, pallas_gcn=False),
        )
        cfg_on = dataclasses.replace(
            cfg_off, film=dataclasses.replace(cfg_off.film, pallas_gcn=True)
        )
        x = _rand(0, (1, 16, 32, 3))
        sst = self._sst(1, 1, 2, 8, 16)
        m_off = FourierNeuralOperatorNetFilmed(cfg_off)
        m_on = FourierNeuralOperatorNetFilmed(cfg_on)
        params = m_off.init(jax.random.PRNGKey(1), x, sst)
        y_off = m_off.apply(params, x, sst, 0.7)
        y_on = m_on.apply(params, x, sst, 0.7)
        np.testing.assert_allclose(
            np.asarray(y_on), np.asarray(y_off), rtol=2e-4, atol=1e-5
        )

        def loss(m):
            return lambda p: jnp.mean(m.apply(p, x, sst, 0.7) ** 2)

        g_off = jax.grad(loss(m_off))(params)
        g_on = jax.grad(loss(m_on))(params)
        flat_on = dict(
            (jax.tree_util.keystr(k), v)
            for k, v in jax.tree_util.tree_leaves_with_path(g_on)
        )
        checked = 0
        for k, v in jax.tree_util.tree_leaves_with_path(g_off):
            ks = jax.tree_util.keystr(k)
            if "film_gen" in ks:
                np.testing.assert_allclose(
                    np.asarray(flat_on[ks]), np.asarray(v),
                    rtol=2e-3, atol=1e-6, err_msg=ks,
                )
                checked += 1
        assert checked > 0

    def test_mesh_disables_fusion(self):
        from msfno_tpu.models.film.gcn import GCNFilmGenerator
        import msfno_tpu.ops.pallas.gcn_layer as gl
        from msfno_tpu.parallel import make_mesh
        from msfno_tpu.parallel.annotate import use_mesh

        sst = self._sst(5, 2, 2, 8, 16)
        g = GCNFilmGenerator(6, embed_dim=8, depth=1, use_pallas=True)
        params = g.init(jax.random.PRNGKey(1), sst)
        y_plain = g.apply(params, sst)

        orig = gl.gcn_layer

        def boom(*a, **kw):
            raise AssertionError("gcn_layer must not run under a mesh")

        gl.gcn_layer = boom
        try:
            mesh = make_mesh(8, shape=(2, 2, 2))
            with use_mesh(mesh):
                y_mesh = g.apply(params, sst)
        finally:
            gl.gcn_layer = orig
        np.testing.assert_allclose(
            np.asarray(y_mesh), np.asarray(y_plain), rtol=1e-5, atol=1e-6
        )
