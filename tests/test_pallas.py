"""Pallas kernel tests, run in interpreter mode on CPU (SURVEY.md section 7.2
step 8: kernels land after correctness is locked by the einsum path)."""

import functools
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

    def test_packed_matches_4dot(self):
        """The packed double-width kernel and the original 4-dot kernel are
        numerically identical (same fp32 accumulation order per output)."""
        import msfno_tpu.ops.pallas.spectral_mlp as sm

        key = jax.random.PRNGKey(7)
        c, h, n = 32, 64, 100
        ws = _weights(key, [c, h, h, c])
        coeffs = jax.lax.complex(
            jax.random.normal(key, (1, n, 1, c)),
            jax.random.normal(jax.random.fold_in(key, 1), (1, n, 1, c)),
        )
        old = sm.PACKED
        try:
            sm.PACKED = True
            out_packed = spectral_mlp(coeffs, ws, interpret=True)
            sm.PACKED = False
            out_4dot = spectral_mlp(coeffs, ws, interpret=True)
        finally:
            sm.PACKED = old
        np.testing.assert_allclose(
            np.asarray(out_packed), np.asarray(out_4dot), rtol=1e-5, atol=1e-5
        )

    def test_karatsuba_matches_reference(self):
        """The 3-GEMM Karatsuba complex multiply reproduces the reference
        MLP (f32 interpret: only summation-order noise)."""
        import msfno_tpu.ops.pallas.spectral_mlp as sm

        key = jax.random.PRNGKey(9)
        c, h, n = 32, 64, 100
        ws = _weights(key, [c, h, h, c])
        coeffs = jax.lax.complex(
            jax.random.normal(key, (1, n, 1, c)),
            jax.random.normal(jax.random.fold_in(key, 2), (1, n, 1, c)),
        )
        old = sm.KARATSUBA
        try:
            sm.KARATSUBA = True
            out_k = spectral_mlp(coeffs, ws, interpret=True)
        finally:
            sm.KARATSUBA = old
        np.testing.assert_allclose(
            np.asarray(out_k), np.asarray(_reference(coeffs, ws)),
            rtol=1e-4, atol=1e-4,
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

    def test_fused_input_gradient_matches_vjp(self):
        """The fused Pallas backward kernel (recompute + transposed chain)
        equals the jnp-reference VJP w.r.t. the input, fp32, exactly-shaped
        (direct `_packed_bwd_call`, interpret mode)."""
        import msfno_tpu.ops.pallas.spectral_mlp as sm

        key = jax.random.PRNGKey(3)
        c, h, n = 16, 32, 100  # n not a tile multiple: exercises padding
        ws = _weights(key, [c, h, h, c])
        x2 = jax.random.normal(key, (n, c, 2))
        g = jax.random.normal(jax.random.fold_in(key, 1), (n, c, 2))

        _, vjp = jax.vjp(lambda x: sm._ref_flat(x, ws, 0.1), x2)
        (dx_ref,) = vjp(g)

        flat = []
        for w in ws:
            flat += [w[..., 0], w[..., 1]]
        dxr, dxi = sm._packed_bwd_call(
            x2[..., 0], x2[..., 1], g[..., 0], g[..., 1], *flat,
            negative_slope=0.1, interpret=True, mxu_dtype="float32",
        )
        dx = jnp.stack([dxr, dxi], axis=-1)
        np.testing.assert_allclose(
            np.asarray(dx), np.asarray(dx_ref), rtol=1e-4, atol=1e-4
        )

    def test_bf16_grad_path_matches_loosely(self):
        """End-to-end grad through spectral_mlp with mxu_dtype=bfloat16 (the
        gate that selects the fused Pallas backward) tracks the fp32 reference
        within bf16 rounding."""
        key = jax.random.PRNGKey(4)
        c, h, n = 16, 32, 64
        ws = _weights(key, [c, h, c])
        coeffs = jax.lax.complex(
            jax.random.normal(key, (n, 1, c)),
            jax.random.normal(jax.random.fold_in(key, 9), (n, 1, c)),
        )

        def loss(co, dtype):
            out = spectral_mlp(co, ws, interpret=True, mxu_dtype=dtype)
            return jnp.sum(jnp.abs(out) ** 2)

        gk = jax.grad(lambda co: loss(co, "bfloat16"))(coeffs)
        gr = jax.grad(lambda co: loss(co, "float32"))(coeffs)
        ref = np.abs(np.asarray(gr)).max()
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gr), rtol=0.1, atol=0.05 * ref
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


class TestDftKernel:
    """Pallas DFT kernels match the matmul path (interpret mode)."""

    def test_analysis_matches(self):
        from msfno_tpu.ops.pallas.dft import dft_analysis
        from msfno_tpu.ops.sht import _dft_analysis_matrices

        nlon, mmax = 64, 17
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, nlon, 8))
        cmat, smat = _dft_analysis_matrices(nlon, mmax)
        fr, fi = dft_analysis(
            x, jnp.asarray(cmat), jnp.asarray(smat), interpret=True
        )
        ref = jnp.fft.rfft(x, axis=-2, norm="forward")[..., :mmax, :]
        np.testing.assert_allclose(np.asarray(fr), np.real(ref), atol=2e-5)
        np.testing.assert_allclose(np.asarray(fi), np.imag(ref), atol=2e-5)

    def test_synthesis_matches(self):
        from msfno_tpu.ops.pallas.dft import dft_synthesis
        from msfno_tpu.ops.sht import _dft_synthesis_matrices

        nlon, mmax = 64, 17
        re = jax.random.normal(jax.random.PRNGKey(1), (1, 10, mmax, 4))
        im = jax.random.normal(jax.random.PRNGKey(2), (1, 10, mmax, 4))
        im = im.at[..., 0, :].set(0.0)
        ci, si = _dft_synthesis_matrices(nlon, mmax)
        out = dft_synthesis(
            re, im, jnp.asarray(ci), jnp.asarray(si), interpret=True
        )
        full = jnp.pad(
            jax.lax.complex(re, im),
            ((0, 0), (0, 0), (0, nlon // 2 + 1 - mmax), (0, 0)),
        )
        ref = jnp.fft.irfft(full, n=nlon, axis=-2, norm="forward")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_sht_pallas_path(self):
        from msfno_tpu.ops.sht import InverseRealSHT, RealSHT

        nlat, nlon, lmax = 16, 32, 8
        x = jax.random.normal(jax.random.PRNGKey(3), (1, nlat, nlon, 4))
        kw = dict(lmax=lmax, mmax=lmax + 1, grid="legendre-gauss")
        import msfno_tpu.ops.pallas.dft as dft_mod

        orig_a, orig_s = dft_mod.dft_analysis, dft_mod.dft_synthesis
        dft_mod.dft_analysis = functools.partial(orig_a, interpret=True)
        dft_mod.dft_synthesis = functools.partial(orig_s, interpret=True)
        try:
            a = RealSHT(nlat, nlon, lon_dft="pallas", **kw)(x)
            b = RealSHT(nlat, nlon, lon_dft="matmul", **kw)(x)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
            ca = InverseRealSHT(nlat, nlon, lon_dft="pallas", **kw)(a)
            cb = InverseRealSHT(nlat, nlon, lon_dft="matmul", **kw)(b)
            np.testing.assert_allclose(np.asarray(ca), np.asarray(cb), atol=2e-5)
        finally:
            dft_mod.dft_analysis, dft_mod.dft_synthesis = orig_a, orig_s


class TestGridMlpKernel:
    """Fused encoder/decoder grid MLP (ops/pallas/grid_mlp.py)."""

    def _params(self, key, c_in, hidden, c_out, b2=True):
        ks = jax.random.split(key, 4)
        w1 = 0.1 * jax.random.normal(ks[0], (c_in, hidden))
        b1 = 0.1 * jax.random.normal(ks[1], (hidden,))
        w2 = 0.1 * jax.random.normal(ks[2], (hidden, c_out))
        bias2 = 0.1 * jax.random.normal(ks[3], (c_out,)) if b2 else None
        return w1, b1, w2, bias2

    @staticmethod
    def _ref(x, w1, b1, w2, b2=None, skip=None, pe=None):
        inp = x if skip is None else jnp.concatenate([x, skip], axis=-1)
        h = jax.nn.gelu(inp @ w1 + b1, approximate=False)
        y = h @ w2
        if b2 is not None:
            y = y + b2
        if pe is not None:
            y = y + pe.reshape(1, *pe.shape[-3:]) if pe.ndim == 3 else y + pe
        return y

    def test_encoder_shape_with_pe(self):
        from msfno_tpu.ops.pallas.grid_mlp import grid_mlp

        B, H, W, C = 2, 16, 32, 7
        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C))
        w1, b1, w2, _ = self._params(jax.random.PRNGKey(1), C, 24, 24, b2=False)
        pe = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (H, W, 24))
        out = grid_mlp(x, w1, b1, w2, pe=pe, mxu_dtype="float32",
                       interpret=True)
        ref = self._ref(x, w1, b1, w2, pe=pe)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_decoder_shape_with_skip(self):
        from msfno_tpu.ops.pallas.grid_mlp import grid_mlp

        B, H, W = 1, 16, 32
        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, 24))
        skip = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 7))
        w1, b1, w2, b2 = self._params(jax.random.PRNGKey(2), 31, 24, 7)
        out = grid_mlp(x, w1, b1, w2, b2=b2, skip=skip,
                       mxu_dtype="float32", interpret=True)
        ref = self._ref(x, w1, b1, w2, b2=b2, skip=skip)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_unaligned_rows_pad(self):
        """Row counts with no aligned tile exercise the padding path."""
        from msfno_tpu.ops.pallas.grid_mlp import grid_mlp

        x = jax.random.normal(jax.random.PRNGKey(0), (1, 7, 13, 5))
        w1, b1, w2, b2 = self._params(jax.random.PRNGKey(1), 5, 16, 9)
        out = grid_mlp(x, w1, b1, w2, b2=b2, mxu_dtype="float32",
                       interpret=True)
        ref = self._ref(x, w1, b1, w2, b2=b2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_match_reference(self):
        from msfno_tpu.ops.pallas.grid_mlp import grid_mlp

        B, H, W, C = 1, 8, 16, 5
        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C))
        skip = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3))
        w1, b1, w2, b2 = self._params(jax.random.PRNGKey(2), C + 3, 16, 6)
        pe = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (H, W, 6))

        def loss_k(x, skip, w1, b1, w2, b2):
            y = grid_mlp(x, w1, b1, w2, b2=b2, skip=skip, pe=pe,
                         mxu_dtype="float32", interpret=True)
            return jnp.sum(y ** 2)

        def loss_r(x, skip, w1, b1, w2, b2):
            y = self._ref(x, w1, b1, w2, b2=b2, skip=skip) + pe
            return jnp.sum(y ** 2)

        gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4, 5))(x, skip, w1, b1, w2, b2)
        gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4, 5))(x, skip, w1, b1, w2, b2)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_in_model(self):
        """pallas_grid_mlp reproduces the standard encoder/decoder path with
        an identical param tree (checkpoint compatibility)."""
        import dataclasses
        import msfno_tpu.ops.pallas.grid_mlp as gm
        from msfno_tpu.models import FourierNeuralOperatorNet
        from tests.test_training import small_cfg

        cfg = small_cfg(film=False)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 32, 3))
        m_ref = FourierNeuralOperatorNet(cfg)
        params = m_ref.init(jax.random.PRNGKey(1), x)
        y_ref = m_ref.apply(params, x)

        orig = gm.grid_mlp

        def interp(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        gm.grid_mlp = interp
        try:
            cfg_p = dataclasses.replace(
                cfg, pallas_grid_mlp=True, grid_mlp_mxu_dtype="float32"
            )
            m_pal = FourierNeuralOperatorNet(cfg_p)
            params_p = m_pal.init(jax.random.PRNGKey(1), x)
            assert jax.tree_util.tree_structure(
                params_p
            ) == jax.tree_util.tree_structure(params)
            y_pal = m_pal.apply(params, x)
        finally:
            gm.grid_mlp = orig
        np.testing.assert_allclose(
            np.asarray(y_pal), np.asarray(y_ref), rtol=1e-4, atol=1e-4
        )

    def test_mesh_falls_back_to_xla_path(self):
        """Under an active mesh the pallas grid MLP silently yields to the
        plain Dense path (pallas_call has no GSPMD partitioning rule), with
        identical outputs and param tree."""
        import msfno_tpu.ops.pallas.grid_mlp as gm
        from msfno_tpu.models.sfno.layers import Mlp
        from msfno_tpu.parallel import make_mesh
        from msfno_tpu.parallel.annotate import use_mesh

        x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 32, 4))
        mlp = Mlp(hidden_features=8, out_features=4, use_pallas=True,
                  mxu_dtype="float32")
        params = mlp.init(jax.random.PRNGKey(1), x)
        y_pallas = mlp.apply(params, x)

        orig = gm.grid_mlp

        def boom(*a, **kw):
            raise AssertionError("grid_mlp must not run under a mesh")

        gm.grid_mlp = boom
        try:
            mesh = make_mesh(8, shape=(2, 2, 2))
            with use_mesh(mesh):
                y_mesh = mlp.apply(params, x)
        finally:
            gm.grid_mlp = orig
        np.testing.assert_allclose(
            np.asarray(y_mesh), np.asarray(y_pallas), rtol=1e-5, atol=1e-5
        )

    def test_dropout_fallback_matches_standard_path(self):
        """The training-time (dropout) fallback inside use_pallas applies
        dropout/pe in the same order as the standard path: same rng => same
        output."""
        from msfno_tpu.models.sfno.layers import Mlp

        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 16, 4))
        pe = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (8, 16, 4))
        kw = dict(hidden_features=8, out_features=4, drop_rate=0.5,
                  mxu_dtype="float32")
        m_pal = Mlp(use_pallas=True, **kw)
        m_std = Mlp(use_pallas=False, **kw)
        params = m_std.init(
            {"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
            x, deterministic=False,
        )
        rngs = {"dropout": jax.random.PRNGKey(7)}
        y_pal = m_pal.apply(params, x, deterministic=False, pe=pe, rngs=rngs)
        y_std = m_std.apply(params, x, deterministic=False, pe=pe, rngs=rngs)
        np.testing.assert_allclose(
            np.asarray(y_pal), np.asarray(y_std), rtol=1e-5, atol=1e-5
        )


class TestKernelGeluLowering:
    """Mosaic has no erf/erfc lowering, so the grid-MLP kernel computes
    exact gelu via the A&S 7.1.26 erf approximation (grid_mlp._gelu_exact).
    Pin its accuracy so a regression can't silently change numerics."""

    def test_gelu_matches_exact_to_fp32(self):
        import jax
        import jax.numpy as jnp

        from msfno_tpu.ops.pallas.grid_mlp import _gelu_exact

        x = jnp.asarray(np.linspace(-8.0, 8.0, 40001), jnp.float32)
        ref = jax.nn.gelu(x, approximate=False)
        got = _gelu_exact(x)
        assert float(jnp.max(jnp.abs(got - ref))) < 2e-6

    def test_no_erf_primitives_in_kernel_jaxpr(self):
        """The fwd pallas path must stay free of lax.erf/erfc (Mosaic
        NotImplementedError on real TPU, observed 2026-08-19) — interpret
        mode would happily run them and hide the breakage."""
        import jax
        import jax.numpy as jnp

        from msfno_tpu.ops.pallas.grid_mlp import grid_mlp

        x = jnp.zeros((64, 8), jnp.float32)
        w1 = jnp.zeros((8, 16)); b1 = jnp.zeros((16,)); w2 = jnp.zeros((16, 8))
        jaxpr = jax.make_jaxpr(
            lambda a: grid_mlp(a, w1, b1, w2, interpret=True)
        )(x)
        prims = {str(e.primitive) for e in jaxpr.jaxpr.eqns}

        def walk(jx, acc):
            for e in jx.eqns:
                acc.add(str(e.primitive))
                for v in e.params.values():
                    core = getattr(v, "jaxpr", None)
                    if core is not None:
                        walk(core, acc)
                    if isinstance(v, (list, tuple)):
                        for vv in v:
                            if getattr(vv, "jaxpr", None) is not None:
                                walk(vv.jaxpr, acc)
            return acc

        all_prims = walk(jaxpr.jaxpr, set(prims))
        assert "erf" not in all_prims and "erfc" not in all_prims, all_prims
