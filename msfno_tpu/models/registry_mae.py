"""MAE (ContextCast) wrappers (reference MSFNO/Models/mae/model.py).

MAEWrapper: SST masked-autoencoder pretraining with NormalCRPS, plus
`running()`-style class-token precompute (model.py:125-164).
LinProbeWrapper: Linear(embed_dim, 1) head regressing the ONI index from
precomputed class tokens (model.py:177-276).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from msfno_tpu.models.film.mae import ContextCast
from msfno_tpu.models.registry import ModelWrapper
from msfno_tpu.training.losses import normal_crps
from msfno_tpu.utils.config import SFNOConfig


class MAEWrapper(ModelWrapper):
    def build_module(self):
        f = self.cfg.film
        return ContextCast(
            patch_size=f.patch_size,
            encoder_dim=f.embed_dim,
            decoder_dim=f.embed_dim,
            nan_mask_threshold=f.nan_mask_threshold,
            dropout=f.dropout,
        )

    def init_params(self, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        f = self.cfg.film
        sst = jnp.zeros((1, f.temporal_step, *f.sst_shape))
        self.params = self.module.init(rng, sst)["params"]
        return self.params

    def loss(self, params, sst, mask_ratio: float, rng,
             train: bool = True) -> jax.Array:
        """CRPS reconstruction loss over masked, valid, non-NaN elements
        (reference train.py:318-339 mae branch + NormalCRPS).  During
        training, FilmConfig.dropout is honored (deterministic=False with a
        dropout rng split off `rng`); eval paths pass train=False."""
        dropout_on = train and self.cfg.film.dropout > 0.0
        rng, drop_rng = jax.random.split(rng)
        (mean, std), (loss_mask, _), _, _ = self.module.apply(
            {"params": params}, sst, mask_ratio=mask_ratio, rng=rng,
            deterministic=not dropout_on,
            rngs={"dropout": drop_rng} if dropout_on else None,
        )
        obs = jnp.nan_to_num(sst)
        return normal_crps(mean, std, obs, mask=loss_mask)

    def make_train_step(self, tx, mask_range=(0.4, 0.8)):
        """Jitted MAE pretraining step; the mask ratio is drawn U(0.4, 0.8)
        per batch *inside* the jitted step (reference train.py:334:
        np.random.uniform(0.4, 0.8)).  The traced ratio flows through
        ContextCast's dynamic-mask path (attention-masked, static shapes)."""
        lo, hi = mask_range

        @jax.jit
        def step(params, opt_state, sst, rng):
            import optax

            ratio_rng, mask_rng = jax.random.split(rng)
            mask_ratio = jax.random.uniform(ratio_rng, (), minval=lo, maxval=hi)

            def loss_fn(p):
                return self.loss(p, sst, mask_ratio, mask_rng)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        return step

    def pretrain(
        self,
        sst_batches,
        steps: int | None = None,
        learning_rate: float = 1e-3,
        seed: int = 0,
        log_every: int = 10,
        writer=None,
    ):
        """SST pretraining driver (reference mae --train path,
        train.py:318-339 + mae/model.py): iterate SST batches, CRPS
        reconstruction loss with per-batch stochastic mask ratio.

        sst_batches: iterable of (B, T, Hs, Ws) arrays (NaN over land).
        Returns (params, losses)."""
        import logging

        import optax

        log = logging.getLogger("msfno_tpu")
        if self.params is None:
            self.init_params(jax.random.PRNGKey(seed))
        tx = optax.adam(learning_rate)
        opt_state = tx.init(self.params)
        step = self.make_train_step(tx)
        rng = jax.random.PRNGKey(seed)
        params, losses = self.params, []
        pending = None  # (i, loss) one step behind: the float() fetch then
        # blocks on the PREVIOUS step, so the next batch's upload/dispatch
        # overlaps compute (same pipeline as Trainer.train)

        def flush(p):
            if p is None:
                return
            i, dev_loss = p
            losses.append(float(dev_loss))
            if writer is not None:
                writer.log({"mae loss": losses[-1]}, step=i)
            if i % log_every == 0:
                log.info("mae pretrain step %d: crps %.5f", i, losses[-1])

        for i, sst in enumerate(sst_batches):
            if steps is not None and i >= steps:
                break
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(sst), sub
            )
            flush(pending)
            pending = (i, loss)
        flush(pending)
        self.params = params
        return params, losses

    def compute_cls_tokens(self, sst_batches) -> tuple[np.ndarray, np.ndarray]:
        """Precompute encoder/decoder class tokens over a dataset so the film
        generator can skip the MAE at SFNO fine-tuning time
        (reference running(), mae/model.py:125-164)."""
        enc_list, dec_list = [], []
        apply = jax.jit(
            lambda sst: self.module.apply(
                {"params": self.params}, sst, mask_ratio=0.0
            )[2:]
        )
        for sst in sst_batches:
            cls_enc, cls_dec = apply(jnp.asarray(sst))
            enc_list.append(np.asarray(cls_enc))
            dec_list.append(np.asarray(cls_dec))
        return np.concatenate(enc_list), np.concatenate(dec_list)


class _LinProbe(nn.Module):
    @nn.compact
    def __call__(self, cls_token):
        return nn.Dense(1, name="head")(cls_token)


class LinProbeWrapper(ModelWrapper):
    """Linear probe: cls token -> ONI scalar (reference Linear_probing,
    mae/model.py:177-276; numeric baselines in
    evaluation/LinearProbingMAE.ipynb)."""

    def build_module(self):
        return _LinProbe()

    def init_params(self, rng=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        f = self.cfg.film
        self.params = self.module.init(rng, jnp.zeros((1, f.embed_dim)))["params"]
        return self.params

    def fit(self, cls_tokens: np.ndarray, oni: np.ndarray, l2: float = 1e-4):
        """Closed-form ridge regression — the probe is linear, no SGD needed."""
        x = np.concatenate([cls_tokens, np.ones((len(cls_tokens), 1))], axis=1)
        a = x.T @ x + l2 * np.eye(x.shape[1])
        b = x.T @ oni.reshape(-1, 1)
        w = np.linalg.solve(a, b)
        kernel, bias = w[:-1], w[-1]
        self.params = {"head": {"kernel": jnp.asarray(kernel),
                                "bias": jnp.asarray(bias)}}
        return self.params

    def mae_metric(self, cls_tokens: np.ndarray, oni: np.ndarray) -> float:
        pred = np.asarray(
            self.module.apply({"params": self.params}, jnp.asarray(cls_tokens))
        ).reshape(-1)
        return float(np.mean(np.abs(pred - oni)))
