"""save_forecast + MAE pretraining driver tests."""

import jax
import numpy as np
import optax

from msfno_tpu.data.synthetic import gen_batch
from msfno_tpu.inference.forecast_writer import ForecastWriter
from msfno_tpu.models import get_model
from msfno_tpu.training.trainer import Trainer, save_forecast
from msfno_tpu.utils.config import TrainConfig
from tests.test_training import small_cfg


def test_save_forecast_roundtrip(tmp_path):
    cfg = small_cfg(film=True)
    tr = Trainer(cfg, TrainConfig(film_scale_start=1.0))
    state = tr.init_state()
    steps = 2
    batches = [gen_batch(cfg, 1, steps, seed=i) for i in range(2)]
    out = save_forecast(tr, state, batches, steps, str(tmp_path / "fc"))
    meta, data = ForecastWriter.read(out)
    assert data.shape == (steps, 2, *cfg.img_size, cfg.out_chans)
    assert np.all(np.isfinite(data))


def test_mae_pretraining_reduces_loss():
    cfg = small_cfg(film=True)
    w = get_model("mae", cfg=cfg)
    params = w.init_params()
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step = w.make_train_step(tx)
    f = cfg.film
    rng = np.random.default_rng(0)
    sst = rng.standard_normal((2, f.temporal_step, *f.sst_shape)).astype(np.float32)
    sst[:, :, :2, :3] = np.nan
    import jax.numpy as jnp

    sst_j = jnp.asarray(sst)
    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(12):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sst_j, k)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert min(losses[6:]) < losses[0]
