"""Loss-function parity vs the reference's own losses.py (oracle import).

The reference loss module runs in-image through tests/ref_compat's
torch_harmonics stub; every field loss reachable from --loss-fn is compared
value-for-value (channels-last here vs NCHW there).  fluct_l2loss_sphere is
excluded: its oracle needs torch_harmonics' ShallowWaterSolver.integrate_grid,
which the stub does not implement.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("scipy")

import jax.numpy as jnp  # noqa: E402

from msfno_tpu.training import losses as L  # noqa: E402
from tests.ref_compat import install_stubs  # noqa: E402

install_stubs()

from MSFNO.Models import losses as ref_losses  # noqa: E402


@pytest.fixture
def fields():
    g = torch.Generator().manual_seed(0)
    prd = torch.randn(2, 5, 16, 32, generator=g)
    tar = torch.randn(2, 5, 16, 32, generator=g)
    to_jax = lambda t: jnp.asarray(np.moveaxis(t.numpy(), 1, -1))
    return prd, tar, to_jax(prd), to_jax(tar)


class TestFieldLossParity:
    def test_cosine_mse(self, fields):
        prd, tar, jp, jt = fields
        ref = float(ref_losses.CosineMSELoss(reduction="mean")(prd, tar))
        np.testing.assert_allclose(float(L.cosine_mse(jp, jt)), ref, rtol=1e-5)

    @pytest.mark.parametrize("squared", [True, False])
    @pytest.mark.parametrize("relative", [True, False])
    def test_l2_sphere(self, fields, relative, squared):
        prd, tar, jp, jt = fields
        ref = float(
            ref_losses.L2Sphere(relative=relative, squared=squared,
                                reduction="sum")(prd, tar)
        )
        got = float(L.l2_sphere(jp, jt, relative=relative, squared=squared))
        np.testing.assert_allclose(got, ref, rtol=1e-4)

    @pytest.mark.parametrize("squared", [True, False])
    def test_l2_sphere_nosine(self, fields, squared):
        prd, tar, jp, jt = fields
        ref = float(
            ref_losses.L2Sphere_noSine(relative=True, squared=squared,
                                       reduction="sum")(prd, tar)
        )
        got = float(L.l2_sphere_nosine(jp, jt, relative=True, squared=squared))
        np.testing.assert_allclose(got, ref, rtol=1e-4)

    def test_registry_default_matches_reference_training(self, fields):
        """--loss-fn L2Sphere_noSine must mean what the reference's
        create_loss builds: relative=True, squared=True (train.py:438-440)."""
        prd, tar, jp, jt = fields
        ref = float(
            ref_losses.L2Sphere_noSine(relative=True, squared=True,
                                       reduction="mean")(prd, tar)
        )
        got = float(L.get_loss("L2Sphere_noSine")(jp, jt))
        np.testing.assert_allclose(got, ref, rtol=1e-4)


class _Solver:
    """Minimal stand-in for the torch_harmonics solver the reference's
    spectral losses expect (attribute .sht, used for lmax and transforms)."""

    def __init__(self, nlat, nlon, lmax, mmax):
        from tests.ref_compat import th_stub

        self.sht = th_stub.RealSHT(
            nlat, nlon, lmax=lmax, mmax=mmax, grid="legendre-gauss"
        )


class TestSpectralLossParity:
    NLAT, NLON, LMAX = 16, 32, 8

    def _pair(self):
        g = torch.Generator().manual_seed(1)
        prd = torch.randn(2, 3, self.NLAT, self.NLON, generator=g)
        tar = torch.randn(2, 3, self.NLAT, self.NLON, generator=g)
        to_jax = lambda t: jnp.asarray(np.moveaxis(t.numpy(), 1, -1))
        solver = _Solver(self.NLAT, self.NLON, self.LMAX, self.LMAX + 1)
        from msfno_tpu.ops.sht import RealSHT

        my_sht = RealSHT(
            self.NLAT, self.NLON, lmax=self.LMAX, mmax=self.LMAX + 1
        )
        return prd, tar, to_jax(prd), to_jax(tar), solver, my_sht

    @pytest.mark.parametrize("relative", [False, True])
    def test_spectral_l2(self, relative):
        prd, tar, jp, jt, solver, my_sht = self._pair()
        ref = float(
            ref_losses.spectral_l2loss_sphere(solver, prd, tar,
                                              relative=relative)
        )
        got = float(L.spectral_l2loss_sphere(my_sht, jp, jt, relative=relative))
        np.testing.assert_allclose(got, ref, rtol=1e-4)

    def test_spectral_weighted(self):
        prd, tar, jp, jt, solver, my_sht = self._pair()
        ref = float(ref_losses.spectral_loss_sphere(solver, prd, tar))
        got = float(L.spectral_loss_sphere(my_sht, jp, jt))
        np.testing.assert_allclose(got, ref, rtol=1e-4)

    def test_h1(self):
        prd, tar, jp, jt, solver, my_sht = self._pair()
        ref = float(ref_losses.h1loss_sphere(solver, prd, tar))
        got = float(L.h1loss_sphere(my_sht, jp, jt))
        np.testing.assert_allclose(got, ref, rtol=1e-4)


class TestDistributionalLossParity:
    def test_normal_crps(self):
        g = torch.Generator().manual_seed(2)
        mu = torch.randn(2, 4, 8, generator=g)
        sigma = torch.randn(2, 4, 8, generator=g)
        obs = torch.randn(2, 4, 8, generator=g)
        mask = (torch.rand(2, 4, 8, generator=g) > 0.3).float()
        ref = float(
            ref_losses.NormalCRPS(reduction="mean", sigma_transform="softplus")(
                mu, sigma, obs, mask.bool()
            )
        )
        got = float(
            L.normal_crps(
                jnp.asarray(mu.numpy()), jnp.asarray(sigma.numpy()),
                jnp.asarray(obs.numpy()), mask=jnp.asarray(mask.numpy()),
            )
        )
        np.testing.assert_allclose(got, ref, rtol=1e-4)

    def test_beta_nll(self):
        g = torch.Generator().manual_seed(3)
        mu = torch.randn(2, 4, 8, generator=g)
        var = torch.randn(2, 4, 8, generator=g)
        obs = torch.randn(2, 4, 8, generator=g)
        ref = float(
            ref_losses.Beta_NLL(beta=0.5, sigma_transform="softplus")(
                mu, var, obs
            )
        )
        got = float(
            L.beta_nll(
                jnp.asarray(mu.numpy()), jnp.asarray(var.numpy()),
                jnp.asarray(obs.numpy()), beta=0.5,
            )
        )
        np.testing.assert_allclose(got, ref, rtol=1e-4)
