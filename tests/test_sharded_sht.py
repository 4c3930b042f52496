"""Sharded SHT vs single-device SHT equivalence on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from msfno_tpu.ops.sht import InverseRealSHT, RealSHT
from msfno_tpu.parallel.sharded_sht import (
    ShardedInverseRealSHT,
    ShardedRealSHT,
    make_sharded_transforms,
)


def _mesh(p):
    devs = np.asarray(jax.devices()[:p]).reshape(p)
    return Mesh(devs, ("lat",))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestShardedSHT:
    @pytest.mark.parametrize("p", [2, 4, 8])
    def test_forward_matches(self, p):
        nlat, nlon, lmax = 32, 64, 16
        sht = RealSHT(nlat, nlon, lmax=lmax, mmax=lmax + 1)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, nlat, nlon, 4))
        ref = sht(x)
        mesh = _mesh(p)
        ssht = ShardedRealSHT(sht, mesh, "lat")
        xd = jax.device_put(x, NamedSharding(mesh, P(None, "lat", None, None)))
        out = ssht(xd)
        # padded orders beyond mmax are zero
        np.testing.assert_allclose(
            np.asarray(out[..., : sht.mmax, :]), np.asarray(ref),
            rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out[..., sht.mmax :, :]), 0.0, atol=1e-6
        )

    @pytest.mark.parametrize("p", [2, 4])
    def test_roundtrip_matches_unsharded(self, p):
        nlat, nlon, lmax = 32, 64, 16
        sht = RealSHT(nlat, nlon, lmax=lmax, mmax=lmax + 1)
        isht = InverseRealSHT(nlat, nlon, lmax=lmax, mmax=lmax + 1)
        mesh = _mesh(p)
        s_f, s_i = make_sharded_transforms(sht, isht, mesh)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, nlat, nlon, 4))
        ref = isht(sht(x))
        xd = jax.device_put(x, NamedSharding(mesh, P(None, "lat", None, None)))
        out = s_i(s_f(xd))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
        )

    def test_jit_and_grad(self):
        nlat, nlon, lmax = 16, 32, 8
        sht = RealSHT(nlat, nlon, lmax=lmax, mmax=lmax + 1)
        isht = InverseRealSHT(nlat, nlon, lmax=lmax, mmax=lmax + 1)
        mesh = _mesh(4)
        s_f, s_i = make_sharded_transforms(sht, isht, mesh)

        @jax.jit
        def loss(x):
            return jnp.sum(s_i(s_f(x)) ** 2)

        x = jax.device_put(
            jax.random.normal(jax.random.PRNGKey(2), (1, nlat, nlon, 2)),
            NamedSharding(mesh, P(None, "lat", None, None)),
        )
        g = jax.grad(loss)(x)
        ref_g = jax.grad(lambda v: jnp.sum(isht(sht(v)) ** 2))(
            jax.device_get(x)
        )
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(ref_g), rtol=1e-3, atol=1e-4
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestUnevenLatitude:
    """Full-resolution analogue: nlat not divisible by the mesh axis (the
    721-row equiangular grid is the motivating case, VERDICT round-1 #6)."""

    @pytest.mark.parametrize("p,nlat", [(2, 21), (4, 21), (8, 21)])
    def test_forward_matches_uneven(self, p, nlat):
        nlon, lmax = 40, 10
        sht = RealSHT(nlat, nlon, lmax=lmax, mmax=lmax + 1, grid="equiangular")
        x = jax.random.normal(jax.random.PRNGKey(3), (2, nlat, nlon, 3))
        ref = sht(x)
        ssht = ShardedRealSHT(sht, _mesh(p), "lat")
        out = ssht(x)
        np.testing.assert_allclose(
            np.asarray(out[..., : sht.mmax, :]), np.asarray(ref),
            rtol=1e-4, atol=1e-4,
        )

    @pytest.mark.parametrize("p", [2, 4])
    def test_roundtrip_uneven(self, p):
        nlat, nlon, lmax = 21, 40, 10
        sht = RealSHT(nlat, nlon, lmax=lmax, mmax=lmax + 1, grid="equiangular")
        isht = InverseRealSHT(
            nlat, nlon, lmax=lmax, mmax=lmax + 1, grid="equiangular"
        )
        s_f, s_i = make_sharded_transforms(sht, isht, _mesh(p))
        x = jax.random.normal(jax.random.PRNGKey(4), (1, nlat, nlon, 3))
        ref = isht(sht(x))
        out = s_i(s_f(x))
        assert out.shape == ref.shape  # padded rows sliced away
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
        )

    def test_grad_uneven(self):
        nlat, nlon, lmax = 21, 40, 10
        sht = RealSHT(nlat, nlon, lmax=lmax, mmax=lmax + 1, grid="equiangular")
        isht = InverseRealSHT(
            nlat, nlon, lmax=lmax, mmax=lmax + 1, grid="equiangular"
        )
        s_f, s_i = make_sharded_transforms(sht, isht, _mesh(4))

        @jax.jit
        def loss(x):
            return jnp.sum(s_i(s_f(x)) ** 2)

        x = jax.random.normal(jax.random.PRNGKey(5), (1, nlat, nlon, 2))
        g = jax.grad(loss)(x)
        ref_g = jax.grad(lambda v: jnp.sum(isht(sht(v)) ** 2))(x)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(ref_g), rtol=1e-3, atol=1e-4
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestSpectralConvSharded:
    def test_spectral_conv_matches_unsharded(self):
        """SpectralConvS2 under a lat>1 mesh (sharded transforms + K-axis
        mode sharding) == the single-device result."""
        from jax.sharding import Mesh

        from msfno_tpu.models.sfno.layers import SpectralConvS2
        from msfno_tpu.parallel.annotate import use_mesh

        nlat, nlon, lmax = 16, 32, 8
        sht = RealSHT(nlat, nlon, lmax=lmax, mmax=lmax + 1)
        isht = InverseRealSHT(nlat, nlon, lmax=lmax, mmax=lmax + 1)
        conv = SpectralConvS2(sht, isht, embed_dim=6)
        x = jax.random.normal(jax.random.PRNGKey(6), (2, nlat, nlon, 6))
        params = conv.init(jax.random.PRNGKey(0), x)
        ref = conv.apply(params, x)

        devs = np.asarray(jax.devices()[:8]).reshape(2, 2, 2)
        mesh = Mesh(devs, ("data", "lat", "channel"))
        with use_mesh(mesh):
            out = jax.jit(conv.apply)(params, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
        )
