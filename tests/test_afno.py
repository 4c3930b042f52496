"""AFNONet family tests (reference fourcastnet/test.py ad-hoc script,
upgraded to assertions)."""

import jax
import jax.numpy as jnp
import numpy as np

from msfno_tpu.models.afno import AFNO2D, AFNONet, PrecipNet, unlog_tp


class TestAFNO2D:
    def test_shape_and_residual(self):
        m = AFNO2D(hidden_size=16, num_blocks=4)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32, 16))
        params = m.init(jax.random.PRNGKey(1), x)
        y = m.apply(params, x)
        assert y.shape == x.shape
        assert np.all(np.isfinite(np.asarray(y)))

    def test_thresholding(self):
        m = AFNO2D(hidden_size=8, num_blocks=2, hard_thresholding_fraction=0.5)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 32, 8))
        params = m.init(jax.random.PRNGKey(1), x)
        y = m.apply(params, x)
        assert np.all(np.isfinite(np.asarray(y)))


class TestAFNONet:
    def test_forward(self):
        net = AFNONet(
            img_size=(32, 64), patch_size=(4, 4), in_chans=5, out_chans=5,
            embed_dim=32, depth=2, num_blocks=4,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 64, 5))
        params = net.init(jax.random.PRNGKey(1), x)
        y = net.apply(params, x)
        assert y.shape == (1, 32, 64, 5)
        assert np.all(np.isfinite(np.asarray(y)))

    def test_grad(self):
        net = AFNONet(
            img_size=(16, 32), patch_size=(4, 4), in_chans=3, out_chans=3,
            embed_dim=16, depth=1, num_blocks=2,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 32, 3))
        params = net.init(jax.random.PRNGKey(1), x)

        def loss(p):
            return jnp.sum(net.apply(p, x) ** 2)

        g = jax.grad(loss)(params)
        total = sum(
            float(jnp.sum(jnp.abs(t))) for t in jax.tree_util.tree_leaves(g)
        )
        assert np.isfinite(total) and total > 0


class TestPrecipNet:
    def test_forward_nonnegative(self):
        backbone = AFNONet(
            img_size=(16, 32), patch_size=(4, 4), in_chans=4, out_chans=1,
            embed_dim=16, depth=1, num_blocks=2,
        )
        net = PrecipNet(backbone=backbone)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 32, 4))
        params = net.init(jax.random.PRNGKey(1), x)
        y = net.apply(params, x)
        assert y.shape == (1, 16, 32, 1)
        assert np.all(np.asarray(y) >= 0)  # ReLU head

    def test_unlog(self):
        x = jnp.asarray([0.0, 1.0])
        y = unlog_tp(x)
        np.testing.assert_allclose(np.asarray(y)[0], 0.0, atol=1e-9)
