"""Fused encoder->spectral head (ops/pallas/grid_mlp.py:
grid_encoder_spectral + the SpectralGridIn plumbing): kernel vs reference,
stats contract, and full-model parity with the unfused path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from msfno_tpu.ops.pallas.grid_mlp import (
    _ref_encoder_spectral,
    grid_encoder_spectral,
)
from msfno_tpu.ops.sht import RealSHT
from tests.test_training import small_cfg


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape)


class TestEncoderSpectralKernel:
    def test_matches_reference(self):
        b, h, w, c_in, c, hidden = 2, 6, 16, 3, 8, 12
        sht = RealSHT(h, w, lmax=6, mmax=7)
        ops = dict(
            x=_rand(0, (b, h, w, c_in)),
            w1=0.2 * _rand(1, (c_in, hidden)),
            b1=0.1 * _rand(2, (hidden,)),
            w2=0.2 * _rand(3, (hidden, c)),
            pe=0.1 * _rand(4, (h, w, c)),
            cs=jnp.asarray(sht.merged_analysis),
        )
        f, ssum, ssq = grid_encoder_spectral(
            ops["x"], ops["w1"], ops["b1"], ops["w2"], ops["pe"], ops["cs"],
            mxu_dtype="float32", interpret=True, out_dtype=jnp.float32,
        )
        f_ref, ssum_ref, ssq_ref = _ref_encoder_spectral(
            ops, "float32", "float32"
        )
        np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ssum), np.asarray(ssum_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ssq), np.asarray(ssq_ref),
                                   rtol=1e-4, atol=1e-4)

    def test_no_pe(self):
        b, h, w, c_in, c, hidden = 1, 4, 8, 2, 4, 6
        sht = RealSHT(h, w, lmax=4, mmax=5)
        ops = dict(
            x=_rand(5, (b, h, w, c_in)),
            w1=0.2 * _rand(6, (c_in, hidden)),
            b1=0.1 * _rand(7, (hidden,)),
            w2=0.2 * _rand(8, (hidden, c)),
            cs=jnp.asarray(sht.merged_analysis),
        )
        f, _, _ = grid_encoder_spectral(
            ops["x"], ops["w1"], ops["b1"], ops["w2"], None, ops["cs"],
            mxu_dtype="float32", interpret=True, out_dtype=jnp.float32,
        )
        f_ref, _, _ = _ref_encoder_spectral(ops, "float32", "float32")
        np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_legendre_stacked_completes_forward(self):
        """legendre_stacked(merged-DFT modes) == the full forward SHT."""
        h, w = 8, 16
        sht = RealSHT(h, w, lmax=8, mmax=9)
        x = _rand(9, (1, h, w, 4))
        full = sht(x)
        f = jnp.einsum("bhwc,wm->bhmc", x, jnp.asarray(sht.merged_analysis))
        np.testing.assert_allclose(
            np.asarray(sht.legendre_stacked(f)), np.asarray(full),
            rtol=1e-4, atol=1e-5,
        )


class TestFusedEncoderInModel:
    def _cfg(self, on: bool):
        cfg = small_cfg(film=False)
        return dataclasses.replace(
            cfg,
            pallas_grid_mlp=True,
            grid_mlp_mxu_dtype="float32",
            fuse_encoder_dft=on,
            fuse_decoder_tail=False,  # isolate the encoder fusion
        )

    def test_model_fused_vs_unfused(self):
        from msfno_tpu.models import FourierNeuralOperatorNet

        x = _rand(0, (1, 16, 32, 3))
        m_off = FourierNeuralOperatorNet(self._cfg(False))
        m_on = FourierNeuralOperatorNet(self._cfg(True))
        params = m_off.init(jax.random.PRNGKey(1), x)
        params_on = m_on.init(jax.random.PRNGKey(1), x)
        assert jax.tree_util.tree_structure(params_on) == (
            jax.tree_util.tree_structure(params)
        )
        y_off = m_off.apply(params, x)
        y_on = m_on.apply(params, x)
        np.testing.assert_allclose(
            np.asarray(y_on), np.asarray(y_off), rtol=1e-3, atol=1e-4
        )

    def test_filmed_with_both_fusions(self):
        """Encoder fusion + decoder-tail fusion together in the filmed net
        (the production fast-tier composition)."""
        from msfno_tpu.models import FourierNeuralOperatorNetFilmed

        cfg0 = small_cfg(film=True)
        base = dataclasses.replace(
            cfg0, pallas_grid_mlp=True, grid_mlp_mxu_dtype="float32"
        )
        cfg_off = dataclasses.replace(
            base, fuse_encoder_dft=False, fuse_decoder_tail=False
        )
        cfg_on = dataclasses.replace(
            base, fuse_encoder_dft=True, fuse_decoder_tail=True
        )
        x = _rand(0, (1, 16, 32, 3))
        sst = jnp.where(
            _rand(1, (1, 2, 8, 16)) > 1.0, jnp.nan, _rand(2, (1, 2, 8, 16))
        )
        m_off = FourierNeuralOperatorNetFilmed(cfg_off)
        m_on = FourierNeuralOperatorNetFilmed(cfg_on)
        params = m_off.init(jax.random.PRNGKey(1), x, sst)
        y_off = m_off.apply(params, x, sst, 0.7)
        y_on = m_on.apply(params, x, sst, 0.7)
        np.testing.assert_allclose(
            np.asarray(y_on), np.asarray(y_off), rtol=1e-3, atol=1e-4
        )

        # film gradients still flow through both fusions
        g = jax.grad(
            lambda p: jnp.mean(m_on.apply(p, x, sst, 0.7) ** 2)
        )(params)
        leaves = [
            (jax.tree_util.keystr(k), v)
            for k, v in jax.tree_util.tree_leaves_with_path(g)
            if "film_gen" in jax.tree_util.keystr(k)
        ]
        assert leaves and all(
            np.isfinite(np.asarray(v)).all() and np.abs(np.asarray(v)).max() > 0
            for _, v in leaves[:3]
        )

    def test_mesh_disables(self):
        from msfno_tpu.models.sfno.sfnonet import _encoder_fusible
        from msfno_tpu.parallel import make_mesh
        from msfno_tpu.parallel.annotate import use_mesh

        cfg = self._cfg(True)
        assert _encoder_fusible(cfg)
        with use_mesh(make_mesh(8, shape=(2, 2, 2))):
            assert not _encoder_fusible(cfg)
