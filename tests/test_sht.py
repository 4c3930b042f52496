"""Golden tests for the SHT core (SURVEY.md section 4 / section 7.2 step 1).

Checks: quadrature exactness, Legendre parity vs scipy spherical harmonics,
band-limited round trips on both grids, rescale invariance, and adjoint
consistency of the gradient.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msfno_tpu.ops.legendre import legendre_matrix
from msfno_tpu.ops.quadrature import clenshaw_curtis, legendre_gauss
from msfno_tpu.ops.sht import InverseRealSHT, RealSHT
from msfno_tpu.ops.fft import RealFFT2, InverseRealFFT2


def _scipy_pbar(l, m, x):
    """Normalized Pbar_l^m(x) from scipy spherical harmonics at phi=0."""
    import scipy.special as sp

    theta = np.arccos(x)
    if hasattr(sp, "sph_harm_y"):
        y = sp.sph_harm_y(l, m, theta, 0.0)
    else:
        y = sp.sph_harm(m, l, 0.0, theta)
    return np.real(y)


class TestQuadrature:
    def test_gauss_weights_sum(self):
        _, w = legendre_gauss(64)
        assert abs(w.sum() - 2.0) < 1e-12

    def test_cc_weights_sum(self):
        _, w = clenshaw_curtis(65)
        assert abs(w.sum() - 2.0) < 1e-12

    @pytest.mark.parametrize("deg", [0, 1, 5, 20])
    def test_gauss_polynomial_exact(self, deg):
        x, w = legendre_gauss(32)
        approx = np.sum(w * x**deg)
        exact = (1.0 - (-1.0) ** (deg + 1)) / (deg + 1)
        assert abs(approx - exact) < 1e-12

    @pytest.mark.parametrize("deg", [0, 1, 5, 20])
    def test_cc_polynomial_exact(self, deg):
        x, w = clenshaw_curtis(33)
        approx = np.sum(w * x**deg)
        exact = (1.0 - (-1.0) ** (deg + 1)) / (deg + 1)
        assert abs(approx - exact) < 1e-10

    def test_north_to_south_ordering(self):
        for x, _ in (legendre_gauss(16), clenshaw_curtis(17)):
            assert np.all(np.diff(x) < 0)


class TestLegendre:
    @pytest.mark.parametrize("l,m", [(0, 0), (1, 0), (1, 1), (5, 3), (10, 10), (20, 7)])
    def test_vs_scipy(self, l, m):
        x = np.linspace(-0.95, 0.95, 11)
        pct = legendre_matrix(l + 1, m + 1, x, csphase=True)
        expected = _scipy_pbar(l, m, x)
        np.testing.assert_allclose(pct[m, l], expected, rtol=1e-10, atol=1e-12)

    def test_orthonormality_gauss(self):
        nlat, lmax = 48, 24
        x, w = legendre_gauss(nlat)
        pct = legendre_matrix(lmax, lmax, x)
        for m in [0, 1, 5]:
            gram = 2.0 * np.pi * np.einsum(
                "lk,nk,k->ln", pct[m, m:], pct[m, m:], w
            )
            np.testing.assert_allclose(gram, np.eye(lmax - m), atol=1e-10)

    def test_zero_above_diagonal(self):
        x, _ = legendre_gauss(16)
        pct = legendre_matrix(8, 8, x)
        for m in range(8):
            assert np.all(pct[m, :m] == 0.0)


def _random_coeffs(key, lmax, mmax, channels):
    """Random valid real-field spectral coefficients (zero for l<m, real m=0)."""
    k1, k2 = jax.random.split(key)
    re = jax.random.normal(k1, (lmax, mmax, channels), dtype=jnp.float32)
    im = jax.random.normal(k2, (lmax, mmax, channels), dtype=jnp.float32)
    im = im.at[:, 0, :].set(0.0)
    mask = np.tril(np.ones((lmax, mmax), dtype=np.float32))[:, :, None]
    return jax.lax.complex(re * mask, im * mask)


@pytest.mark.parametrize(
    "grid,nlat,nlon",
    [("legendre-gauss", 32, 64), ("equiangular", 33, 64), ("legendre-gauss", 48, 96)],
)
class TestRoundTrip:
    def test_coeff_roundtrip(self, grid, nlat, nlon):
        lmax = nlat // 2
        mmax = lmax + 1
        sht = RealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid=grid)
        isht = InverseRealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid=grid)
        coeffs = _random_coeffs(jax.random.PRNGKey(0), lmax, mmax, 4)
        # zero the m=lmax column: l<m everywhere there, carries no signal
        back = sht(isht(coeffs))
        np.testing.assert_allclose(
            np.asarray(back), np.asarray(coeffs), rtol=2e-4, atol=2e-4
        )

    def test_grid_roundtrip(self, grid, nlat, nlon):
        lmax = nlat // 2
        mmax = lmax + 1
        sht = RealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid=grid)
        isht = InverseRealSHT(nlat, nlon, lmax=lmax, mmax=mmax, grid=grid)
        coeffs = _random_coeffs(jax.random.PRNGKey(1), lmax, mmax, 2)
        x = isht(coeffs)  # band-limited real field
        assert x.dtype == jnp.float32
        x2 = isht(sht(x))
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=2e-4, atol=2e-4)

    def test_rescale_invariance(self, grid, nlat, nlon):
        lmax = nlat // 2
        kw = dict(lmax=lmax, mmax=lmax + 1, grid=grid)
        sht = RealSHT(nlat, nlon, spectral_rescale=1e5, **kw)
        isht = InverseRealSHT(nlat, nlon, spectral_rescale=1e5, **kw)
        coeffs = _random_coeffs(jax.random.PRNGKey(2), lmax, lmax + 1, 2)
        x = InverseRealSHT(nlat, nlon, **kw)(coeffs)
        scaled = sht(x)
        plain = RealSHT(nlat, nlon, **kw)(x)
        np.testing.assert_allclose(
            np.asarray(scaled), np.asarray(plain) * 1e5, rtol=2e-4, atol=2e-1
        )
        x2 = isht(scaled)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=2e-4, atol=2e-4)


class TestGradients:
    def test_grad_matches_finite_difference(self):
        """d/dx Re<SHT(x), y> via autodiff == central finite differences."""
        nlat, nlon, lmax = 16, 32, 8
        sht = RealSHT(nlat, nlon, lmax=lmax, mmax=lmax + 1)
        x = jax.random.normal(jax.random.PRNGKey(3), (nlat, nlon, 2))
        y = _random_coeffs(jax.random.PRNGKey(4), lmax, lmax + 1, 2)
        dx = jax.random.normal(jax.random.PRNGKey(5), x.shape)

        def g(x):
            return jnp.sum(jnp.real(sht(x) * jnp.conj(y)))

        autodiff = float(jnp.vdot(jax.grad(g)(x), dx))
        eps = 1e-3
        fd = float((g(x + eps * dx) - g(x - eps * dx)) / (2 * eps))
        np.testing.assert_allclose(autodiff, fd, rtol=1e-3)

    def test_grad_finite(self):
        nlat, nlon, lmax = 16, 32, 8
        sht = RealSHT(nlat, nlon, lmax=lmax, mmax=lmax + 1)
        isht = InverseRealSHT(nlat, nlon, lmax=lmax, mmax=lmax + 1)

        def loss(x):
            return jnp.sum(isht(sht(x)) ** 2)

        g = jax.grad(loss)(jnp.ones((nlat, nlon, 3), jnp.float32))
        assert np.all(np.isfinite(np.asarray(g)))


class TestFFT2:
    def test_roundtrip(self):
        nlat, nlon = 32, 64
        lmax, mmax = 16, 17
        f = RealFFT2(nlat, nlon, lmax=lmax, mmax=mmax)
        finv = InverseRealFFT2(nlat, nlon, lmax=lmax, mmax=mmax)
        x = jax.random.normal(jax.random.PRNGKey(5), (2, nlat, nlon, 4))
        y = f(x)
        assert y.shape == (2, lmax, mmax, 4)
        x2 = finv(y)
        assert x2.shape == x.shape
        # The inverse replicates the reference's end-padding irfft2 semantics
        # (layers.py:236-249; see InverseRealFFT2 docstring): negative-
        # frequency rows are re-interpreted at positive positions, so the
        # round trip is exact only for fields whose m>0 spectrum lives in the
        # positive rows [0, ceil(lmax/2)) — asserted here.
        spec = np.zeros((2, nlat, nlon // 2 + 1, 4), dtype=np.complex64)
        rng = np.random.default_rng(0)
        kmax, mm = lmax // 2 - 2, mmax - 2
        r = lambda *s: rng.standard_normal(s).astype(np.float32)
        spec[:, :kmax, 1:mm] = r(2, kmax, mm - 1, 4) + 1j * r(2, kmax, mm - 1, 4)
        xb = jnp.fft.irfft2(
            jnp.asarray(spec), s=(nlat, nlon), axes=(-3, -2), norm="ortho"
        )
        xb2 = finv(f(xb))
        np.testing.assert_allclose(np.asarray(xb2), np.asarray(xb), atol=1e-5)


class TestDftMatmulParity:
    """matmul-DFT longitude stage == XLA rfft/irfft stage (bit-level up to
    fp32 accumulation)."""

    @pytest.mark.parametrize("nlat,nlon,mmax", [(32, 64, 17), (24, 48, 25)])
    def test_forward(self, nlat, nlon, mmax):
        lmax = nlat // 2
        kw = dict(lmax=lmax, mmax=min(mmax, nlon // 2 + 1), grid="legendre-gauss")
        x = jax.random.normal(jax.random.PRNGKey(7), (2, nlat, nlon, 3))
        a = RealSHT(nlat, nlon, lon_dft="matmul", **kw)(x)
        b = RealSHT(nlat, nlon, lon_dft="fft", **kw)(x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    @pytest.mark.parametrize("nlat,nlon,mmax", [(32, 64, 17), (24, 48, 25)])
    def test_inverse(self, nlat, nlon, mmax):
        lmax = nlat // 2
        mmax = min(mmax, nlon // 2 + 1)
        kw = dict(lmax=lmax, mmax=mmax, grid="legendre-gauss")
        coeffs = _random_coeffs(jax.random.PRNGKey(8), lmax, mmax, 3)
        a = InverseRealSHT(nlat, nlon, lon_dft="matmul", **kw)(coeffs)
        b = InverseRealSHT(nlat, nlon, lon_dft="fft", **kw)(coeffs)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
