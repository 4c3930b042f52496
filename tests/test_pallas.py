"""Pallas kernel tests, run in interpreter mode on CPU (SURVEY.md section 7.2
step 8: kernels land after correctness is locked by the einsum path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msfno_tpu.ops.contractions import compl_mul, to_complex
from msfno_tpu.ops.activations import complex_relu
from msfno_tpu.ops.pallas.spectral_mlp import spectral_mlp


def _weights(key, dims):
    ws = []
    for i in range(len(dims) - 1):
        key, k = jax.random.split(key)
        ws.append(0.1 * jax.random.normal(k, (dims[i], dims[i + 1], 2)))
    return ws


def _reference(coeffs, ws):
    x = coeffs
    for w in ws[:-1]:
        x = compl_mul(x, to_complex(w))
        x = complex_relu(x, mode="real")
    return compl_mul(x, to_complex(ws[-1]))


class TestSpectralMlpKernel:
    @pytest.mark.parametrize("n_modes", [64, 100, 256])
    def test_matches_reference(self, n_modes):
        key = jax.random.PRNGKey(0)
        c, h = 32, 64
        ws = _weights(key, [c, h, h, c])
        k1, k2 = jax.random.split(key)
        coeffs = jax.lax.complex(
            jax.random.normal(k1, (1, n_modes, 1, c)),
            jax.random.normal(k2, (1, n_modes, 1, c)),
        )
        ref = _reference(coeffs, ws)
        out = spectral_mlp(coeffs, ws, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
        )

    def test_gradient_matches_reference(self):
        key = jax.random.PRNGKey(1)
        c, h, n = 16, 32, 64
        ws = _weights(key, [c, h, c])
        coeffs = jax.lax.complex(
            jax.random.normal(key, (n, 1, c)), jax.random.normal(key, (n, 1, c))
        )

        def loss_k(ws):
            out = spectral_mlp(coeffs, ws, interpret=True)
            return jnp.sum(jnp.abs(out) ** 2)

        def loss_r(ws):
            out = _reference(coeffs, ws)
            return jnp.sum(jnp.abs(out) ** 2)

        gk = jax.grad(loss_k)(ws)
        gr = jax.grad(loss_r)(ws)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3
            )

    def test_in_model(self):
        """use_pallas config flag produces the same outputs as the einsum path
        (interpret mode via monkeypatched default)."""
        import dataclasses
        import msfno_tpu.ops.pallas.spectral_mlp as sm
        from msfno_tpu.models import FourierNeuralOperatorNet
        from tests.test_training import small_cfg

        cfg = small_cfg(film=False)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 32, 3))
        m_ref = FourierNeuralOperatorNet(cfg)
        params = m_ref.init(jax.random.PRNGKey(1), x)
        y_ref = m_ref.apply(params, x)

        orig = sm.spectral_mlp

        def interp(coeffs, ws, negative_slope=0.0, interpret=False, **kw):
            return orig(coeffs, ws, negative_slope, interpret=True)

        sm.spectral_mlp = interp
        try:
            m_pal = FourierNeuralOperatorNet(
                dataclasses.replace(cfg, use_pallas=True)
            )
            y_pal = m_pal.apply(params, x)
        finally:
            sm.spectral_mlp = orig
        np.testing.assert_allclose(
            np.asarray(y_pal), np.asarray(y_ref), rtol=1e-4, atol=1e-4
        )
