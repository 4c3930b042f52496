"""Fused inner-block channel MLP (blocks.py fuse_mlp_affine +
ops/pallas/grid_mlp.py affine/residual operands): the per-sample norm1+FiLM
affine and the outer identity skip run inside the kernel.  Kernel vs
reference, full-model parity fused-vs-unfused on both the pallas and jnp
paths, and film-gradient flow."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from msfno_tpu.models import (
    FourierNeuralOperatorNet,
    FourierNeuralOperatorNetFilmed,
)
from msfno_tpu.ops.pallas.grid_mlp import _ref_mlp, grid_mlp
from tests.test_training import small_cfg


def _rand(key, shape, scale=1.0):
    return scale * jax.random.normal(jax.random.PRNGKey(key), shape)


def _mk_ops(n=128, ns=2, c_in=8, hidden=12, c_out=8):
    return dict(
        x=_rand(0, (n, c_in)),
        w1=_rand(1, (c_in, hidden), 0.2),
        b1=_rand(2, (hidden,), 0.1),
        w2=_rand(3, (hidden, c_out), 0.2),
        b2=_rand(4, (c_out,), 0.1),
        aff_a=1.0 + _rand(5, (ns, c_in), 0.3),
        aff_b=_rand(6, (ns, c_in), 0.2),
        res=_rand(7, (n, c_out)),
    )


class TestAffineResidualKernel:
    def test_matches_reference(self):
        ops = _mk_ops()
        y = grid_mlp(
            ops["x"], ops["w1"], ops["b1"], ops["w2"], b2=ops["b2"],
            affine=(ops["aff_a"], ops["aff_b"]), residual=ops["res"],
            mxu_dtype="float32", interpret=True,
        )
        y_ref = _ref_mlp(ops)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_affine_only_and_residual_only(self):
        ops = _mk_ops()
        y = grid_mlp(
            ops["x"], ops["w1"], ops["b1"], ops["w2"], b2=ops["b2"],
            affine=(ops["aff_a"], ops["aff_b"]),
            mxu_dtype="float32", interpret=True,
        )
        ref = {k: v for k, v in ops.items() if k != "res"}
        np.testing.assert_allclose(np.asarray(y), np.asarray(_ref_mlp(ref)),
                                   rtol=1e-4, atol=1e-5)
        y = grid_mlp(
            ops["x"], ops["w1"], ops["b1"], ops["w2"], b2=ops["b2"],
            residual=ops["res"], mxu_dtype="float32", interpret=True,
        )
        ref = {k: v for k, v in ops.items() if not k.startswith("aff")}
        np.testing.assert_allclose(np.asarray(y), np.asarray(_ref_mlp(ref)),
                                   rtol=1e-4, atol=1e-5)

    def test_unaligned_rows_fallback(self):
        # 2 samples x 37 rows: no tile divides 37 — the wrapper applies the
        # affine outside the kernel, same values
        ops = _mk_ops(n=74, ns=2)
        y = grid_mlp(
            ops["x"], ops["w1"], ops["b1"], ops["w2"], b2=ops["b2"],
            affine=(ops["aff_a"], ops["aff_b"]), residual=ops["res"],
            mxu_dtype="float32", interpret=True,
        )
        np.testing.assert_allclose(np.asarray(y), np.asarray(_ref_mlp(ops)),
                                   rtol=1e-4, atol=1e-5)

    def test_affine_gradients(self):
        ops = _mk_ops()

        def f(a, b):
            return jnp.sum(
                grid_mlp(
                    ops["x"], ops["w1"], ops["b1"], ops["w2"], b2=ops["b2"],
                    affine=(a, b), residual=ops["res"],
                    mxu_dtype="float32", interpret=True,
                )
                ** 2
            )

        def f_ref(a, b):
            return jnp.sum(_ref_mlp(dict(ops, aff_a=a, aff_b=b)) ** 2)

        ga = jax.grad(f, argnums=(0, 1))(ops["aff_a"], ops["aff_b"])
        gr = jax.grad(f_ref, argnums=(0, 1))(ops["aff_a"], ops["aff_b"])
        for a, b in zip(ga, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


def _deep_cfg(film=False, **kw):
    cfg = small_cfg(film=film)
    cfg = dataclasses.replace(cfg, num_layers=4, **kw)
    if film:
        cfg = dataclasses.replace(
            cfg, film=dataclasses.replace(cfg.film, film_layers=3)
        )
    return cfg


class TestBlockFusedModel:
    def _run_pair(self, film, pallas):
        kw = dict(use_pallas=pallas, pallas_grid_mlp=pallas)
        cfg_off = _deep_cfg(film=film, fuse_inner_mlp=False, **kw)
        cfg_on = _deep_cfg(film=film, fuse_inner_mlp=True, **kw)
        x = _rand(10, (1, 16, 32, 3))
        if film:
            sst = np.array(_rand(11, (1, 2, 8, 16)))
            sst[0, 0, :2, :3] = np.nan
            sst = jnp.asarray(sst)
            m_off = FourierNeuralOperatorNetFilmed(cfg_off)
            m_on = FourierNeuralOperatorNetFilmed(cfg_on)
            params = m_off.init(jax.random.PRNGKey(0), x, sst)
            return (
                m_off.apply(params, x, sst, 1.0),
                m_on.apply(params, x, sst, 1.0),
                (m_on, params, x, sst),
            )
        m_off = FourierNeuralOperatorNet(cfg_off)
        m_on = FourierNeuralOperatorNet(cfg_on)
        params = m_off.init(jax.random.PRNGKey(0), x)
        return m_off.apply(params, x), m_on.apply(params, x), None

    def test_plain_net_parity_pallas(self):
        y_off, y_on, _ = self._run_pair(film=False, pallas=True)
        np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                                   rtol=2e-4, atol=2e-4)

    def test_plain_net_parity_jnp(self):
        y_off, y_on, _ = self._run_pair(film=False, pallas=False)
        np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                                   rtol=2e-4, atol=2e-4)

    def test_filmed_net_parity(self):
        y_off, y_on, _ = self._run_pair(film=True, pallas=True)
        np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                                   rtol=2e-4, atol=2e-4)

    def test_film_gradients_flow(self):
        _, _, (model, params, x, sst) = self._run_pair(film=True, pallas=True)

        def loss(p):
            return jnp.mean(model.apply(p, x, sst, 1.0) ** 2)

        g = jax.grad(loss)(params)
        leaves = [
            (jax.tree_util.keystr(k), np.asarray(v))
            for k, v in jax.tree_util.tree_leaves_with_path(g)
            if "film_gen" in jax.tree_util.keystr(k)
        ]
        assert leaves
        assert all(np.isfinite(v).all() for _, v in leaves)
        assert any(np.abs(v).max() > 0 for _, v in leaves)

    def test_mesh_path_runs(self):
        # under a mesh the Mlp falls back to plain Denses and applies the
        # affine in jnp — same math, shardable
        from msfno_tpu.parallel import make_mesh
        from msfno_tpu.parallel.annotate import use_mesh

        cfg_on = _deep_cfg(film=False, fuse_inner_mlp=True,
                           use_pallas=False, pallas_grid_mlp=False)
        x = _rand(10, (2, 16, 32, 3))
        m = FourierNeuralOperatorNet(cfg_on)
        params = m.init(jax.random.PRNGKey(0), x)
        y_ref = m.apply(params, x)
        with use_mesh(make_mesh(8, shape=(2, 2, 2))):
            y = m.apply(params, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-4, atol=1e-4)


class TestOutputDtype:
    def test_model_output_dtype(self):
        cfg = _deep_cfg(film=False, output_dtype="bfloat16")
        x = _rand(10, (1, 16, 32, 3))
        m = FourierNeuralOperatorNet(cfg)
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.dtype == jnp.bfloat16
        cfg32 = _deep_cfg(film=False)
        y32 = FourierNeuralOperatorNet(cfg32).apply(params, x)
        assert y32.dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(y, dtype=np.float32), np.asarray(y32),
            rtol=2e-2, atol=2e-2,
        )

    def test_scan_rollout_bf16_carry(self):
        from msfno_tpu.inference.rollout import scan_rollout

        cfg = _deep_cfg(film=True, output_dtype="bfloat16")
        x = _rand(10, (1, 16, 32, 3))
        sst = np.array(_rand(11, (1, 2, 8, 16)))
        sst[0, 0, :2, :3] = np.nan
        sst = jnp.asarray(sst)
        m = FourierNeuralOperatorNetFilmed(cfg)
        params = m.init(jax.random.PRNGKey(0), x, sst)
        sst_seq = jnp.broadcast_to(sst[None], (3,) + sst.shape)
        outs = scan_rollout(m, params["params"], x, 3, sst_seq=sst_seq)
        assert outs.shape[0] == 3
        assert np.isfinite(np.asarray(outs, dtype=np.float32)).all()
