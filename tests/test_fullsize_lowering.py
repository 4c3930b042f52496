"""AOT-lower the FULL 721x1440 sharded programs on the 8-device CPU mesh.

VERDICT r4 weak #5: every sharded test ran tiny shapes, so the uneven-lat
padding path (H=721 over lat in {2,4}) and the full-size collective shapes
had never been traced end-to-end.  `.lower()` (trace only, no compile/run)
pins exactly that — the sharded train step (fwd+bwd+optimizer) and the
scan-rollout program at production shapes — in seconds of CPU time and
without materializing any full-size buffer (jax.eval_shape / ShapeDtypeStruct
inputs only).

The extracted all_to_all operand shapes feed the comm-volume model in
BASELINE.md ("Round-5 comm volume").
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import pytest

from msfno_tpu.parallel import make_mesh, make_sharded_train_step
from msfno_tpu.training.trainer import Trainer
from msfno_tpu.utils.config import FilmConfig, SFNOConfig, TrainConfig


def _flagship_cfg() -> SFNOConfig:
    # the production POD tier: bf16 compute like the fast tier, but
    # use_pallas=False so the explicit all_to_all sharded SHT engages
    # (spectral_transforms gates the sharded variant off under the fused
    # Pallas kernels, whose mode layout is unsharded — layers.py:66-85)
    return SFNOConfig(
        film=FilmConfig(film_gen_type="gcn_custom", compute_dtype="bfloat16"),
        compute_dtype="bfloat16",
        checkpointing_block=True,
        spectral_mxu_dtype="bfloat16",
        sht_mxu_dtype="bfloat16",
    )


_COLL_RE = re.compile(
    r"(\w+):(f32|f16|bf16|c64)\[([0-9,]*)\]\s*=\s*"
    r"(all_to_all|ppermute|all_gather|psum|psum_invariant|reduce_scatter)\b"
)


def _collective_shapes(jaxpr_text: str) -> list[tuple[str, str, str]]:
    """(op, dtype, dims) triples for collectives bound in the jaxpr (the
    jaxpr is used instead of StableHLO text: as_text() inlines the SHT
    weight constants — ~700 MB at full size)."""
    return [
        (m.group(4), m.group(2), m.group(3))
        for m in _COLL_RE.finditer(jaxpr_text)
    ]


@pytest.mark.parametrize("shape", [(2, 2, 2), (1, 4, 2)])
def test_fullsize_sharded_train_step_lowers(shape):
    mesh = make_mesh(8, shape=shape)
    cfg = _flagship_cfg()
    tcfg = TrainConfig(batch_size=1, film_scale_start=1.0)
    trainer = Trainer(cfg, tcfg)

    state_abs = jax.eval_shape(
        trainer._init_state_impl, jax.random.PRNGKey(0)
    )
    s = tcfg.multi_step_training + 2
    h, w = cfg.img_size
    f = cfg.film
    era5 = jax.ShapeDtypeStruct((s, 1, h, w, cfg.in_chans), jnp.float32)
    sst = jax.ShapeDtypeStruct(
        (s, 1, f.temporal_step, *f.sst_shape), jnp.float32
    )

    step, _ = make_sharded_train_step(trainer, mesh)
    traced = step.trace(state_abs, era5, sst)
    # tracing at full size IS the assertion of interest: H=721 over
    # lat in {2,4} exercises the uneven-lat padding arithmetic end-to-end
    text = str(traced.jaxpr)
    colls = _collective_shapes(text)
    assert any(op == "all_to_all" for op, _, _ in colls), (
        f"no all_to_all in the full-size jaxpr for mesh {shape}; "
        f"collectives found: {sorted(set(c[0] for c in colls))}"
    )
    # the lowering itself must also succeed (shardings are consistent)
    traced.lower()


def test_fullsize_sharded_rollout_lowers_and_comm_volume():
    from msfno_tpu.models import FourierNeuralOperatorNetFilmed

    mesh = make_mesh(8, shape=(2, 2, 2))
    cfg = _flagship_cfg()
    model = FourierNeuralOperatorNetFilmed(cfg)
    h, w = cfg.img_size
    f = cfg.film
    x_abs = jax.ShapeDtypeStruct((1, h, w, cfg.in_chans), jnp.float32)
    sst_abs = jax.ShapeDtypeStruct(
        (1, f.temporal_step, *f.sst_shape), jnp.float32
    )
    params_abs = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, h, w, cfg.in_chans)),
                             jnp.zeros((1, f.temporal_step, *f.sst_shape))),
        jax.random.PRNGKey(0),
    )

    steps = 4

    def roll(params, x0, sst_seq):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from msfno_tpu.parallel.annotate import use_mesh

        with use_mesh(mesh):
            def body(state, s):
                nxt = model.apply(params, state, s, 1.0)
                return nxt, jnp.mean(nxt[0, :8, :128, 0])

            _, means = jax.lax.scan(body, x0, sst_seq)
            return means

    sst_seq = jax.ShapeDtypeStruct((steps, *sst_abs.shape), jnp.float32)
    traced = jax.jit(roll).trace(params_abs, x_abs, sst_seq)
    text = str(traced.jaxpr)
    colls = _collective_shapes(text)
    a2a = [(dt, dims) for op, dt, dims in colls if op == "all_to_all"]
    assert a2a, "no all_to_all in the full-size sharded rollout jaxpr"
    traced.lower()

    # comm-volume sanity: all_to_all payloads at full size must be
    # MB-scale (the BASELINE.md comm model is derived from these shapes;
    # jaxpr types inside shard_map are PER-SHARD)
    def nbytes(dt: str, dims: str) -> int:
        item = {"f32": 4, "bf16": 2, "f16": 2, "c64": 8}[dt]
        n = item
        for d in dims.split(","):
            if d:
                n *= int(d)
        return n

    biggest = max(nbytes(dt, dims) for dt, dims in a2a)
    assert biggest > 1 << 20, (
        f"largest all_to_all payload {biggest} bytes — full-size sharding "
        f"does not appear to be engaged; shapes: {a2a[:8]}"
    )
