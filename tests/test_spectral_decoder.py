"""Fused spectral->output decoder kernel (ops/pallas/spectral_decoder.py).

Covers: the DFT mode-power identity behind the spectral instance-norm
statistics, the kernel vs its jnp reference (interpret mode on CPU), the
fused tail inside the full nets (param-tree and output parity vs the
unfused path), and FiLM gradient flow through the folded affine."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msfno_tpu.ops.pallas.spectral_decoder import (
    _ref_decoder,
    spectral_decoder,
    spectral_grid_stats,
)
from msfno_tpu.ops.sht import InverseRealSHT
from tests.test_training import small_cfg


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


class TestSpectralStats:
    def test_mode_power_identity(self):
        """sum_w x_w^2 == W * sum_m omega_m hm_m^2 for x = hm @ M — the DFT
        orthogonality identity, including the Nyquist column (mmax=W/2+1
        exercises the zeroed m=0/Nyquist sin rows)."""
        itrans = InverseRealSHT(16, 32)  # mmax = 17 = nlon//2 + 1
        two_m = 2 * itrans.mmax
        hm = np.asarray(_rand(0, (3, two_m, 4)), dtype=np.float64)
        mat = np.asarray(itrans.merged_matrix_t, dtype=np.float64).T
        x = np.einsum("bmc,mw->bwc", hm, mat)
        lhs = (x * x).sum(axis=1)
        rhs = itrans.nlon * np.einsum(
            "bmc,m->bc", hm * hm, itrans.mode_power_weights.astype(np.float64)
        )
        np.testing.assert_allclose(lhs, rhs, rtol=1e-5)

    def test_gram_is_diagonal(self):
        """The omega derivation assumes M M^T is diagonal — pin it."""
        itrans = InverseRealSHT(16, 32)
        mat = np.asarray(itrans.merged_matrix_t, dtype=np.float64).T
        gram = mat @ mat.T
        off = gram - np.diag(np.diag(gram))
        # the matrix is stored fp32, so off-diagonals sit at fp32 rounding
        # scale rather than exact zero
        assert np.abs(off).max() < 1e-6 * np.abs(gram).max()

    def test_stats_match_pixel_stats(self):
        """spectral_grid_stats == pixel-space mean / mean-square of the
        synthesized grid field."""
        itrans = InverseRealSHT(8, 32, lmax=8, mmax=9)
        two_m = 2 * itrans.mmax
        hm = _rand(1, (2, 8, two_m, 5))
        x = jnp.einsum("bhmc,wm->bhwc", hm, jnp.asarray(itrans.merged_matrix_t))
        mean, mean_sq = spectral_grid_stats(hm, itrans.mode_power_weights)
        np.testing.assert_allclose(
            np.asarray(mean), np.asarray(jnp.mean(x, axis=(1, 2))),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(mean_sq), np.asarray(jnp.mean(x * x, axis=(1, 2))),
            rtol=1e-5, atol=1e-6,
        )


class TestSpectralDecoderKernel:
    def _ops(self, b=2, h=6, w=32, c=8, s=3, hidden=16, out=5, mmax=9):
        itrans = InverseRealSHT(h, w, lmax=h, mmax=mmax)
        two_m = 2 * mmax
        ops = dict(
            hm=_rand(0, (b, h, two_m, c)),
            skip=_rand(1, (b, h, w, s)),
            mt=jnp.asarray(itrans.merged_matrix_t),
            a=1.0 + 0.1 * _rand(2, (b, c)),
            b=0.1 * _rand(3, (b, c)),
            w1=0.1 * _rand(4, (c + s, hidden)),
            b1=0.1 * _rand(5, (hidden,)),
            w2=0.1 * _rand(6, (hidden, out)),
        )
        return ops

    def test_matches_reference_f32(self):
        ops = self._ops()
        y = spectral_decoder(
            ops["hm"], ops["skip"], ops["mt"], ops["a"], ops["b"],
            ops["w1"], ops["b1"], ops["w2"],
            mxu_dtype="float32", interpret=True,
        )
        y_ref = _ref_decoder(ops)
        assert y.dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-5
        )

    def test_b2_and_out_dtype(self):
        ops = self._ops()
        b2 = 0.1 * _rand(7, (5,))
        y = spectral_decoder(
            ops["hm"], ops["skip"], ops["mt"], ops["a"], ops["b"],
            ops["w1"], ops["b1"], ops["w2"], b2=b2,
            mxu_dtype="float32", interpret=True, out_dtype=jnp.bfloat16,
        )
        ops["b2"] = b2
        y_ref = _ref_decoder(ops, out_dtype="bfloat16")
        assert y.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(y, dtype=np.float32),
            np.asarray(y_ref, dtype=np.float32),
            rtol=2e-2, atol=1e-2,
        )

    def test_gradients_match_reference(self):
        ops = self._ops(b=1, h=4, w=16, mmax=5)

        def loss_k(hm, a, b, w1, b1, w2):
            y = spectral_decoder(hm, ops["skip"], ops["mt"], a, b, w1, b1,
                                 w2, mxu_dtype="float32", interpret=True)
            return jnp.sum(y ** 2)

        def loss_r(hm, a, b, w1, b1, w2):
            o = dict(ops, hm=hm, a=a, b=b, w1=w1, b1=b1, w2=w2)
            return jnp.sum(_ref_decoder(o) ** 2)

        args = (ops["hm"], ops["a"], ops["b"], ops["w1"], ops["b1"], ops["w2"])
        gk = jax.grad(loss_k, argnums=tuple(range(6)))(*args)
        gr = jax.grad(loss_r, argnums=tuple(range(6)))(*args)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            )


def _f32_cfg(cfg):
    return dataclasses.replace(
        cfg,
        pallas_grid_mlp=True,
        grid_mlp_mxu_dtype="float32",
        use_pallas=False,
    )


class TestFusedTailInModel:
    def test_sfno_fused_vs_unfused(self):
        """The fused tail reproduces the standard decoder path (f32 MXU) with
        an identical parameter tree."""
        from msfno_tpu.models import FourierNeuralOperatorNet

        cfg = _f32_cfg(small_cfg(film=False))
        x = _rand(0, (1, 16, 32, 3))
        m_off = FourierNeuralOperatorNet(
            dataclasses.replace(cfg, fuse_decoder_tail=False)
        )
        m_on = FourierNeuralOperatorNet(cfg)
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

    def test_filmed_fused_vs_unfused_and_grads(self):
        """Filmed net: fused tail matches, and FiLM-parameter gradients flow
        through the folded (a, b) affine identically (fine-tuning path)."""
        from msfno_tpu.models import FourierNeuralOperatorNetFilmed

        cfg = _f32_cfg(small_cfg(film=True))
        x = _rand(0, (1, 16, 32, 3))
        sst = jnp.where(
            _rand(1, (1, 2, 8, 16)) > 1.0, jnp.nan, _rand(2, (1, 2, 8, 16))
        )
        m_off = FourierNeuralOperatorNetFilmed(
            dataclasses.replace(cfg, fuse_decoder_tail=False)
        )
        m_on = FourierNeuralOperatorNetFilmed(cfg)
        params = m_off.init(jax.random.PRNGKey(1), x, sst)
        y_off = m_off.apply(params, x, sst, 0.7)
        y_on = m_on.apply(params, x, sst, 0.7)
        np.testing.assert_allclose(
            np.asarray(y_on), np.asarray(y_off), rtol=1e-3, atol=1e-4
        )

        def loss(m):
            def f(p):
                return jnp.mean(m.apply(p, x, sst, 0.7) ** 2)
            return f

        g_off = jax.grad(loss(m_off))(params)
        g_on = jax.grad(loss(m_on))(params)
        flat_off = jax.tree_util.tree_leaves_with_path(g_off)
        flat_on = dict(
            (jax.tree_util.keystr(k), v)
            for k, v in jax.tree_util.tree_leaves_with_path(g_on)
        )
        checked = 0
        for k, v in flat_off:
            ks = jax.tree_util.keystr(k)
            if "film_gen" in ks or "norm1" in ks:
                np.testing.assert_allclose(
                    np.asarray(flat_on[ks]), np.asarray(v),
                    rtol=2e-3, atol=1e-5, err_msg=ks,
                )
                checked += 1
        assert checked > 0

    def test_mesh_disables_fusion(self):
        """Under an active mesh the tail gate must stay off (pallas_call has
        no GSPMD rule) — the model still runs and matches."""
        from msfno_tpu.models import FourierNeuralOperatorNet
        from msfno_tpu.models.sfno.sfnonet import _tail_fusible
        from msfno_tpu.parallel import make_mesh
        from msfno_tpu.parallel.annotate import use_mesh

        cfg = _f32_cfg(small_cfg(film=False))
        assert _tail_fusible(cfg)
        mesh = make_mesh(8, shape=(2, 2, 2))
        with use_mesh(mesh):
            assert not _tail_fusible(cfg)
            x = _rand(0, (2, 16, 32, 3))
            m = FourierNeuralOperatorNet(cfg)
            params = m.init(jax.random.PRNGKey(1), x)
            y = m.apply(params, x)
        assert np.isfinite(np.asarray(y)).all()

    def test_fft_config_not_fused(self):
        """Non-SHT configs bypass the gate and still run."""
        from msfno_tpu.models import FourierNeuralOperatorNet
        from msfno_tpu.models.sfno.sfnonet import _tail_fusible

        cfg = dataclasses.replace(
            _f32_cfg(small_cfg(film=False)), spectral_transform="fft"
        )
        assert not _tail_fusible(cfg)
        x = _rand(0, (1, 16, 32, 3))
        m = FourierNeuralOperatorNet(cfg)
        params = m.init(jax.random.PRNGKey(1), x)
        y = m.apply(params, x)
        assert np.isfinite(np.asarray(y)).all()
