"""Training orchestration (reference Trainer, MSFNO/Models/train.py:35-1337).

TPU-first structure: the entire optimization step — multi-step autoregressive
rollout, loss with discount/skip semantics, gradient, optimizer update — is
one jitted function over a TrainState pytree; the host loop only feeds
batches and handles cadence (validation, checkpointing, film-scale ramp,
time-limit stop).  Data parallelism is a mesh axis, not a DDP wrapper: batches
are sharded over "data" and gradients are reduced by construction under jit
(vs. reference NCCL DDP, train.py:370-380).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import time
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from msfno_tpu.data.normalization import Normalizer, SSTNormalizer
from msfno_tpu.data.synthetic import Batch, gen_batch, synthetic_loader
from msfno_tpu.models import FourierNeuralOperatorNet, FourierNeuralOperatorNetFilmed
from msfno_tpu.training import checkpoint as ckpt_io
from msfno_tpu.training.losses import get_loss
from msfno_tpu.training.optim import create_optimizer
from msfno_tpu.training.partition import (
    count_params,
    film_trainable_predicate,
    merge_params,
    split_params,
)
from msfno_tpu.utils.config import SFNOConfig, TrainConfig, to_json
from msfno_tpu.utils.observability import FinTraining, LocalLog, Timer

log = logging.getLogger("msfno_tpu")


def _is_oom_error(e: Exception) -> bool:
    """True for OOM-shaped device failures (XlaRuntimeError with
    RESOURCE_EXHAUSTED / allocator out-of-memory text).  Used by
    test_batch_size so only memory exhaustion shrinks the answer."""
    msg = str(e)
    low = msg.lower()
    # "exceeds the maximum" alone also appears in non-memory XLA errors
    # ("exceeds the maximum supported dimension size"); require memory/HBM
    # wording alongside it so shape bugs raise instead of shrinking the
    # reported max batch
    return (
        "RESOURCE_EXHAUSTED" in msg
        or "out of memory" in low
        or (
            "exceeds the maximum" in low
            and ("memory" in low or "hbm" in low or "allocat" in low)
        )
    )


def chunk_input_bytes_per_step(model_cfg: SFNOConfig, train_cfg: TrainConfig) -> int:
    """Host/HBM bytes of ONE batch inside a scan chunk: _device_chunk stacks
    K of these into a single (K, S, B, ...) fp32 buffer (S = multi-step
    rollout states + target)."""
    h, w = model_cfg.img_size
    s = train_cfg.multi_step_training + 2
    n = s * train_cfg.batch_size * h * w * model_cfg.in_chans
    if model_cfg.film is not None:
        f = model_cfg.film
        n += (
            s
            * train_cfg.batch_size
            * f.temporal_step
            * f.sst_shape[0]
            * f.sst_shape[1]
        )
    return n * 4  # fp32


def auto_scan_steps(
    model_cfg: SFNOConfig,
    train_cfg: TrainConfig,
    hbm_budget_bytes: int | None = None,
    max_k: int = 16,
) -> int:
    """Derive K for --scan-steps auto.

    K is the largest value that (a) divides validation_interval — chunks
    then tile the cadence exactly, with no ragged drain before every
    validation; (b) keeps the stacked (K, S, B, H, W, C) input chunk under
    an HBM budget (default: a quarter of the device's bytes_limit — the
    rest stays free for params, optimizer state, and activations); and
    (c) is at most max_k (dispatch amortization flattens out — measured
    62.5 ms/step at K=8 full size, tools/bench_train_step.py)."""
    if hbm_budget_bytes is None:
        limit = None
        try:
            stats = jax.local_devices()[0].memory_stats()
            limit = (stats or {}).get("bytes_limit")
        except Exception:
            limit = None
        limit = limit or 16 * 2**30  # v5e-class default
        hbm_budget_bytes = limit // 4
    per = chunk_input_bytes_per_step(model_cfg, train_cfg)
    cap = int(max(1, min(max_k, hbm_budget_bytes // max(per, 1))))
    vi = train_cfg.validation_interval
    if vi and vi > 0:
        k = max(d for d in range(1, cap + 1) if vi % d == 0)
    else:
        k = cap
    log.info(
        "scan-steps auto: K=%d (chunk %.0f MB of %.0f MB budget, "
        "validation_interval=%s)",
        k, k * per / 2**20, hbm_budget_bytes / 2**20, vi,
    )
    return k


@struct.dataclass
class TrainState:
    trainable: dict
    frozen: dict
    opt_state: Any
    step: jax.Array
    film_scale: jax.Array

    @property
    def params(self) -> dict:
        return merge_params(self.trainable, self.frozen)


class Trainer:
    """Drives training/validation/evaluation of SFNO and filmed-SFNO models."""

    def __init__(
        self,
        model_cfg: SFNOConfig,
        train_cfg: TrainConfig,
        normalizer: Normalizer | None = None,
        sst_normalizer: SSTNormalizer | None = None,
        writer: LocalLog | None = None,
        checkpoint_dir: str | None = None,
        mesh=None,
    ):
        self.cfg = model_cfg
        self.tcfg = train_cfg
        self.mesh = mesh
        self.filmed = model_cfg.film is not None
        self.model = (
            FourierNeuralOperatorNetFilmed(model_cfg)
            if self.filmed
            else FourierNeuralOperatorNet(model_cfg)
        )
        self.normalizer = normalizer or Normalizer.identity(model_cfg.in_chans)
        self.sst_normalizer = sst_normalizer or SSTNormalizer.identity()
        self.loss_fn = get_loss(train_cfg.loss_fn, model_cfg)
        self.tx = create_optimizer(train_cfg)
        self.writer = writer or LocalLog()
        self.checkpoint_dir = checkpoint_dir
        self.epoch = 0
        self.start_epoch = 0
        self.iter = 0
        self._start_time = time.time()
        if mesh is not None:
            # SPMD over the mesh: shardings via the annotate hooks + GSPMD
            from msfno_tpu.parallel.annotate import use_mesh

            def _sharded(fn):
                def wrapped(state, era5, sst):
                    with use_mesh(mesh):
                        return fn(state, era5, sst)

                return jax.jit(wrapped)

            self._train_step = _sharded(self._train_step_impl)
            self._val_step = _sharded(self._val_step_impl)
            self._train_steps = _sharded(self._train_steps_impl)
        else:
            self._train_step = jax.jit(self._train_step_impl)
            self._val_step = jax.jit(self._val_step_impl)
            self._train_steps = jax.jit(self._train_steps_impl)

    # ------------------------------------------------------------- setup

    def init_state(self, rng: jax.Array | None = None) -> TrainState:
        state = self._init_state_impl(rng)
        if self.mesh is not None:
            from msfno_tpu.parallel.sharded_train import shard_state

            state = shard_state(state, self.mesh)
        return state

    def _init_state_impl(self, rng: jax.Array | None = None) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(self.tcfg.seed)
        h, w = self.cfg.img_size
        x = jnp.zeros((1, h, w, self.cfg.in_chans))
        if self.filmed:
            f = self.cfg.film
            sst = jnp.zeros((1, f.temporal_step, *f.sst_shape))
            # jit the init: eager flax init is pathological over the
            # remote-TPU tunnel (thousands of tiny dispatches)
            params = jax.jit(self.model.init)(rng, x, sst)["params"]
            pred = film_trainable_predicate(
                self.tcfg.retrain_film, self.cfg.num_layers
            )
            trainable, frozen = split_params(params, pred)
        else:
            params = jax.jit(self.model.init)(rng, x)["params"]
            trainable, frozen = params, {}
        if self.tcfg.bf16_frozen_params and frozen:
            from msfno_tpu.inference.rollout import serving_params

            frozen = serving_params(frozen)
        log.info(
            "params: %d trainable / %d frozen",
            count_params(trainable),
            count_params(frozen),
        )
        return TrainState(
            trainable=trainable,
            frozen=frozen,
            opt_state=self.tx.init(trainable),
            step=jnp.zeros((), jnp.int32),
            film_scale=jnp.asarray(self.tcfg.film_scale_start, jnp.float32),
        )

    # -------------------------------------------------------- forward/loss

    @property
    def _has_dropout(self) -> bool:
        c = self.cfg
        film_drop = c.film.dropout if c.film is not None else 0.0
        return (c.drop_rate > 0.0 or c.drop_path_rate > 0.0
                or film_drop > 0.0)

    def _train_rngs(self, step):
        """Per-step dropout/droppath PRNGs, folded from the config seed so
        the jitted step stays pure and reproducible."""
        base = jax.random.fold_in(
            jax.random.PRNGKey(self.tcfg.seed), step
        )
        kd, kp = jax.random.split(base)
        return {"dropout": kd, "droppath": kp}

    def _apply(self, params, x, sst, scale, rngs=None):
        """rngs non-None => training mode (deterministic=False): without
        this, configs with drop_rate/dropout > 0 would silently train with
        all regularization disabled (the flax modules default
        deterministic=True and apply() would lack the dropout PRNG)."""
        variables = {"params": params}
        det = rngs is None
        if self.filmed:
            return self.model.apply(
                variables, x, sst, scale, deterministic=det, rngs=rngs
            )
        return self.model.apply(variables, x, deterministic=det, rngs=rngs)

    def _rollout_loss(self, params, era5, sst, scale, rngs=None):
        """Multi-step autoregressive loss (reference train.py:146-197).

        era5: (S, B, H, W, C) raw; sst: (S, B, T, Hs, Ws) or None.
        loss = sum_step disc^step * L(out, gt) / (ms+1).

        Accumulation note: the reference scales the loss by 1/(acc+1) and
        *sums* gradients over the acc+1 micro-steps (train.py:162, 177-185);
        here optax.MultiSteps (optim.py) *averages* micro-step gradients, so
        the loss must NOT carry the 1/(acc+1) factor — both conventions yield
        the mean micro-batch gradient.
        """
        t = self.tcfg
        ms, skip = t.multi_step_training, t.training_step_skip
        inp = self.normalizer(era5[0])
        total = 0.0
        per_step = []
        for step in range(ms + 1):
            sst_step = (
                self.sst_normalizer(sst[step + 1]) if sst is not None else None
            )
            step_rngs = (
                {k: jax.random.fold_in(v, step) for k, v in rngs.items()}
                if rngs is not None
                else None
            )
            out = self._apply(params, inp, sst_step, scale, rngs=step_rngs)
            if step % (skip + 1) == 0:
                gt = self.normalizer(era5[step + 1])
                l = self.loss_fn(out, gt) / (ms + 1) * t.discount_factor**step
                total = total + l
                per_step.append(l)
            inp = out
        return total, jnp.stack(per_step)

    def _train_step_impl(self, state: TrainState, era5, sst):
        rngs = self._train_rngs(state.step) if self._has_dropout else None

        def loss_fn(trainable):
            params = merge_params(trainable, state.frozen)
            return self._rollout_loss(
                params, era5, sst, state.film_scale, rngs=rngs
            )

        (loss, per_step), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable
        )
        updates, opt_state = self.tx.update(grads, state.opt_state, state.trainable)
        import optax

        trainable = optax.apply_updates(state.trainable, updates)
        new_state = dataclasses.replace(
            state,
            trainable=trainable,
            opt_state=opt_state,
            step=state.step + 1,
        )
        gnorm = optax.global_norm(grads)
        return new_state, {"loss": loss, "per_step": per_step, "grad_norm": gnorm}

    def _train_steps_impl(self, state: TrainState, era5, sst):
        """K sequential optimizer steps in ONE compiled program.

        era5: (K, S, B, H, W, C); sst: (K, S, B, T, Hs, Ws) or None.
        Semantically identical to K dispatched `_train_step` calls (same
        sequential SGD over the K batches) but launched once: amortizes the
        per-call host dispatch (one kernel launch per K batches; over the
        axon relay that alone is ~3-5 ms/step).  Metrics come back stacked
        along the leading K axis.

        The frozen backbone is closed over (a scan *constant*), NOT carried:
        an unchanged carry element relies on XLA loop-invariant code motion
        to avoid a per-iteration copy of the multi-GB frozen pytree; hoisting
        it out of the carry guarantees it (measured neutral on v5e — LICM was
        already doing the hoist — but load-bearing under any sharding that
        defeats LICM).
        """
        frozen = state.frozen

        def body(carry, xs):
            trainable, opt_state, step, film_scale = carry
            e, s = xs if sst is not None else (xs, None)
            st = TrainState(trainable, frozen, opt_state, step, film_scale)
            st, metrics = self._train_step_impl(st, e, s)
            return (
                (st.trainable, st.opt_state, st.step, st.film_scale),
                metrics,
            )

        carry0 = (state.trainable, state.opt_state, state.step, state.film_scale)
        xs = era5 if sst is None else (era5, sst)
        (trainable, opt_state, step, film_scale), metrics = jax.lax.scan(
            body, carry0, xs
        )
        return (
            TrainState(trainable, frozen, opt_state, step, film_scale),
            metrics,
        )

    def train_steps(self, state: TrainState, era5, sst=None):
        """Public scan-chained multi-batch step; see `_train_steps_impl`."""
        return self._train_steps(state, era5, sst)

    def _val_step_impl(self, state: TrainState, era5, sst):
        """Validation rollout: per-step loss and per-variable MSE
        (reference validation(), train.py:533-654)."""
        params = merge_params(state.trainable, state.frozen)
        t = self.tcfg
        ms, skip = t.multi_step_validation, t.validation_step_skip
        inp = self.normalizer(era5[0])
        losses, per_var = [], []
        for step in range(ms + 1):
            sst_step = (
                self.sst_normalizer(sst[step + 1]) if sst is not None else None
            )
            out = self._apply(params, inp, sst_step, state.film_scale)
            if step % (skip + 1) == 0:
                gt = self.normalizer(era5[step + 1])
                losses.append(self.loss_fn(out, gt))
                per_var.append(jnp.mean((out - gt) ** 2, axis=(0, 1, 2)))
            inp = out
        return jnp.stack(losses), jnp.stack(per_var)

    # ------------------------------------------------------------ loops

    def _device_batch(self, batch: Batch):
        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P

            from msfno_tpu.parallel.mesh import even_put

            era5 = even_put(
                batch.era5, self.mesh, P(None, "data", "lat", None, None)
            )
            sst = (
                even_put(batch.sst, self.mesh, P(None, "data", None, None, None))
                if batch.sst is not None
                else None
            )
            return era5, sst
        era5 = jnp.asarray(batch.era5)
        sst = jnp.asarray(batch.sst) if batch.sst is not None else None
        return era5, sst

    def _device_chunk(self, batches: list[Batch]):
        """Stack K batches to (K, S, B, ...) and upload once, for the
        scan-chained `_train_steps` program."""
        era5 = np.stack([np.asarray(b.era5) for b in batches])
        sst = (
            np.stack([np.asarray(b.sst) for b in batches])
            if batches[0].sst is not None
            else None
        )
        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P

            from msfno_tpu.parallel.mesh import even_put

            era5 = even_put(
                era5, self.mesh, P(None, None, "data", "lat", None, None)
            )
            if sst is not None:
                sst = even_put(
                    sst, self.mesh, P(None, None, "data", None, None, None)
                )
            return era5, sst
        return jnp.asarray(era5), (jnp.asarray(sst) if sst is not None else None)

    def _epoch_iterator(self, loader, epoch: int, num_batches: int):
        """Resolve the per-epoch batch iterator (reference pre_epoch seeding +
        sampler.set_epoch, train.py:300-305).  Accepts a PrefetchLoader (has
        .epoch(e)), a callable epoch -> iterator, a plain iterable, or None
        (synthetic data)."""
        if loader is None:
            return synthetic_loader(
                self.cfg,
                self.tcfg.batch_size,
                self.tcfg.multi_step_training,
                num_batches,
                seed=self.tcfg.seed + epoch,  # pre_epoch re-seed (train.py:300-305)
            )
        if hasattr(loader, "epoch"):
            return loader.epoch(epoch)
        if callable(loader):
            return loader(epoch)
        if epoch > 0 and iter(loader) is loader:
            # a bare iterator is exhausted after epoch 0; training silently on
            # nothing is the failure mode this guards against
            raise ValueError(
                "plain iterator loader cannot be reused across epochs; pass a "
                "PrefetchLoader or a callable epoch -> iterator"
            )
        return iter(loader)

    def train(
        self,
        state: TrainState,
        loader=None,
        val_loader: Callable[[], Iterator[Batch]] | None = None,
        num_batches: int = 10,
    ) -> TrainState:
        """Epoch loop (reference train()/train_epoch, train.py:64-298).

        loader: None (synthetic), a PrefetchLoader, a callable
        epoch -> Iterator[Batch], or (single-epoch only) an iterable of Batch.
        """
        t = self.tcfg
        # resume continues from the restored epoch (restore_train_state sets
        # start_epoch from checkpoint meta; reference train.py:300 iterates
        # range(start_epoch, epochs)) instead of re-running — and
        # re-numbering checkpoints of — the completed ones.  One-shot so a
        # later train() call on the same trainer starts fresh.
        start, self.start_epoch = self.start_epoch, 0
        # scan_steps > 1: fuse K optimizer steps into one lax.scan launch
        # (`_train_steps`), amortizing per-step dispatch.  Chunks never
        # straddle a validation boundary and loader tails fall back to
        # single steps, so cadence (validation/checkpoint/log order) is
        # bit-identical to the per-batch loop.
        K = max(1, t.scan_steps)

        # Metric fetches are deferred by ONE dispatch so the host never
        # blocks on the step it just launched: batch k+1's host->device
        # upload and launch are already queued when we block on step k's
        # scalars, letting the (hundreds-of-MB) input copy overlap the
        # previous step's compute.  Values and log order are identical to
        # the synchronous loop.
        pending = None  # ("single"|"scan", first_iter, metrics, film_scale)

        def flush(p):
            if p is None:
                return
            kind, it0, m, fs = p
            if kind == "single":
                self.writer.log(
                    {
                        "loss": float(m["loss"]),
                        "grad_norm": float(m["grad_norm"]),
                        "film scale": float(fs),
                    },
                    step=it0,
                )
            else:  # scan: metrics carry a leading K axis, one row per step
                loss = np.asarray(m["loss"])
                gnorm = np.asarray(m["grad_norm"])
                for j in range(loss.shape[0]):
                    self.writer.log(
                        {
                            "loss": float(loss[j]),
                            "grad_norm": float(gnorm[j]),
                            "film scale": float(fs),
                        },
                        step=it0 + j,
                    )

        def room() -> int:
            """Steps until the next validation boundary (stable while a
            chunk buffers: self.iter only advances on dispatch)."""
            if t.validation_interval <= 0:
                return K
            return t.validation_interval - (self.iter % t.validation_interval)

        def run_single(st, batch, pend):
            era5, sst = self._device_batch(batch)
            st, metrics = self._train_step(st, era5, sst)
            self.iter += 1
            flush(pend)
            return st, ("single", self.iter, metrics, st.film_scale)

        def run_chunk(st, batches, pend):
            era5, sst = self._device_chunk(batches)
            st, metrics = self._train_steps(st, era5, sst)
            first = self.iter + 1
            self.iter += len(batches)
            flush(pend)
            # film_scale is constant within a chunk: it only moves in
            # validation(), and chunks never cross a validation boundary
            return st, ("scan", first, metrics, st.film_scale)

        # one sync here; afterwards self.iter mirrors state.step host-side
        # (_train_step_impl advances it by exactly +1 per call)
        self.iter = int(state.step)
        try:
            for self.epoch in range(start, t.training_epochs):
                it = self._epoch_iterator(loader, self.epoch, num_batches)
                buf: list[Batch] = []
                t_epoch = time.perf_counter()
                iter0 = self.iter

                def maybe_validate():
                    nonlocal state, pending
                    if (
                        t.validation_interval > 0
                        and self.iter % t.validation_interval == 0
                    ):
                        pending = flush(pending)  # log order: train before val
                        state = self.validation(state, val_loader)
                        if (
                            self.checkpoint_dir
                            and t.save_checkpoint_interval > 0
                            and (self.iter // t.validation_interval)
                            % t.save_checkpoint_interval
                            == 0
                        ):
                            self.save_checkpoint(state)

                for batch in it:
                    self._check_time_limit()
                    if buf and np.asarray(batch.era5).shape != np.asarray(
                        buf[0].era5
                    ).shape:
                        # ragged batch mid-stream (e.g. a drop_last=False
                        # loader tail): _train_steps needs a rectangular
                        # (K, S, B, ...) stack, so drain the buffered prefix
                        # as singles, then re-evaluate the normal path with
                        # room() recomputed at the advanced iter
                        for b in buf:
                            state, pending = run_single(state, b, pending)
                            maybe_validate()
                        buf = []
                    if K > 1 and room() >= K:
                        buf.append(batch)
                        if len(buf) < K:
                            continue
                        state, pending = run_chunk(state, buf, pending)
                        buf = []
                    else:
                        state, pending = run_single(state, batch, pending)
                    maybe_validate()
                for batch in buf:  # loader ended mid-chunk: drain as singles
                    self._check_time_limit()
                    state, pending = run_single(state, batch, pending)
                    maybe_validate()
                pending = flush(pending)
                # per-epoch throughput WITH the input pipeline in the loop
                # (flush above synced the last step, so this is honest
                # wall time for load+upload+compute, excluding the
                # post-epoch validation/checkpoint below)
                n_steps = self.iter - iter0
                if n_steps:
                    dt_epoch = time.perf_counter() - t_epoch
                    log.info(
                        "epoch %d: %d steps in %.1fs (%.2f steps/s, "
                        "data pipeline in the loop)",
                        self.epoch, n_steps, dt_epoch, n_steps / dt_epoch,
                    )
                # post_epoch: validate + checkpoint (train.py:307-316)
                state = self.validation(state, val_loader)
                if self.checkpoint_dir:
                    self.save_checkpoint(state)
        except FinTraining as e:
            flush(pending)
            log.info("training finished early: %s", e)
            if self.checkpoint_dir:
                self.save_checkpoint(state)
        finally:
            # drain any in-flight async orbax write before returning so the
            # caller never observes a half-committed final checkpoint
            ckpt_io.wait_for_async_saves()
        return state

    def validation(
        self, state: TrainState, val_loader: Callable[[], Iterator[Batch]] | None = None
    ) -> TrainState:
        t = self.tcfg
        batches = (
            list(val_loader())
            if val_loader is not None
            else [
                gen_batch(
                    self.cfg, t.batch_size, t.multi_step_validation, seed=10_000 + i
                )
                for i in range(2)
            ]
        )
        all_losses, all_var = [], []
        for batch in batches:
            era5, sst = self._device_batch(batch)
            losses, per_var = self._val_step(state, era5, sst)
            all_losses.append(np.asarray(losses))
            all_var.append(np.asarray(per_var))
        mean_losses = np.mean(all_losses, axis=0)
        metrics = {
            f"validation loss step={k}": float(v) for k, v in enumerate(mean_losses)
        }
        mean_var = np.mean(all_var, axis=0)
        for k in range(mean_var.shape[0]):
            for c in range(mean_var.shape[1]):
                metrics[f"MSE var{c} step={k}"] = float(mean_var[k, c])
        if self.filmed and batches and batches[0].sst is not None:
            # gamma/beta statistics (reference valid_log, train.py:704-736).
            # Jitted and cached: an eager FilmWrapper.apply dispatches the
            # whole generator op-by-op (~3-5 ms per op over the remote-TPU
            # relay — the same pathology init avoids by jitting model.init)
            if not hasattr(self, "_film_stats_fn"):
                from msfno_tpu.models.film.wrapper import FilmWrapper

                wrapper = FilmWrapper(self.cfg.film)
                self._film_stats_fn = jax.jit(
                    lambda p, s: wrapper.apply({"params": p}, s)
                )
            film_mod = self._film_stats_fn(
                state.params["film_gen"],
                jnp.asarray(self.sst_normalizer(batches[0].sst[0])),
            )
            metrics["gamma mean"] = float(jnp.mean(film_mod[:, 0]))
            metrics["beta mean"] = float(jnp.mean(film_mod[:, 1]))
        if t.advanced_logging:
            # reference mem_log/system_monitor telemetry (train.py:747-756)
            from msfno_tpu.utils.observability import (
                device_memory_stats,
                system_monitor,
            )

            sysm = system_monitor(printout=False)
            metrics["host ram percent"] = sysm["ram_percent"]
            metrics["process rss gb"] = sysm["process_rss_gb"]
            for i, d in enumerate(device_memory_stats()):
                if d.get("bytes_in_use") is not None:
                    metrics[f"device{i} hbm gb"] = round(
                        d["bytes_in_use"] / 2**30, 3
                    )
        self.writer.log(metrics, step=self.iter)
        # FiLM scale ramp: += film_scale_step until 1 (train.py:638-641)
        if self.filmed and float(state.film_scale) < 1.0:
            state = dataclasses.replace(
                state,
                film_scale=jnp.minimum(
                    state.film_scale + self.tcfg.film_scale_step, 1.0
                ),
            )
        return state

    # ------------------------------------------------------ housekeeping

    def _check_time_limit(self):
        """Graceful stop 15 min before the wall (reference time_limit_stop,
        train.py:821-828)."""
        t = self.tcfg
        if t.time_limit_s is None:
            return
        # the 15-min grace must not exceed half the limit, or a short smoke
        # run (--time-limit 600) would stop before its first step
        grace = min(15 * 60, t.time_limit_s / 2)
        if time.time() - self._start_time > t.time_limit_s - grace:
            raise FinTraining("time limit reached")

    def save_checkpoint(self, state: TrainState, tag: str = "") -> str | None:
        if self.checkpoint_dir is None:
            return None
        import os

        orbax = self.tcfg.checkpoint_backend == "orbax"
        if not orbax and jax.process_count() > 1:
            # npz gathers the full tree to one host's numpy — impossible
            # for shards on other processes' devices; orbax saves each
            # host's addressable shards in place (checkpoint.py)
            raise ValueError(
                "npz checkpoints cannot gather remote shards on a "
                "multi-host mesh; use --checkpoint-backend orbax"
            )
        name = f"checkpoint_iter={self.iter}_epoch={self.epoch}{tag}"
        if not orbax:
            name += ".npz"  # orbax checkpoints are directories
        path = os.path.join(self.checkpoint_dir, name)
        save_fn = ckpt_io.save_checkpoint_orbax if orbax else ckpt_io.save_checkpoint
        kwargs = {"async_save": True} if (
            orbax and self.tcfg.async_checkpoint
        ) else {}
        save_fn(
            path,
            state.params,
            opt_state=state.opt_state,
            step=self.iter,
            epoch=self.epoch,
            config_json=to_json(self.cfg),
            extra={"film_scale": float(state.film_scale)},
            **kwargs,
        )
        self.writer.save(f"_epoch{self.epoch}")
        return path

    def save_data(self, loader, out_dir: str, num_batches: int = 4) -> str:
        """Dump raw training batches to .npz (reference --save-data action,
        main.py:293 -> Trainer.save_data)."""
        import os

        os.makedirs(out_dir, exist_ok=True)
        for i, batch in enumerate(loader):
            if i >= num_batches:
                break
            arrays = {"era5": batch.era5, "times": batch.times}
            if batch.sst is not None:
                arrays["sst"] = batch.sst
            np.savez(os.path.join(out_dir, f"batch_{i:04d}.npz"), **arrays)
        return out_dir

    # ------------------------------------------------ perf harness trio
    # (reference --test-performance: train.py:1196-1337)

    def test_model_speed(self, state: TrainState, iters: int = 10) -> float:
        """Forward-pass speed on synthetic data (train.py:1196-1208)."""
        batch = gen_batch(self.cfg, self.tcfg.batch_size, 0, seed=0)
        era5, sst = self._device_batch(batch)
        params = state.params

        def _fwd(p, x, s):
            if self.mesh is not None:
                from msfno_tpu.parallel.annotate import use_mesh

                with use_mesh(self.mesh):
                    return self._apply(p, x, s, state.film_scale)
            return self._apply(p, x, s, state.film_scale)

        fwd = jax.jit(_fwd)
        fwd(params, era5[0], sst[0] if sst is not None else None).block_until_ready()
        with Timer("model fwd", divisor=iters) as tm:
            for _ in range(iters):
                out = fwd(params, era5[0], sst[0] if sst is not None else None)
            out.block_until_ready()
        return tm.seconds

    def test_dataloader_speed(self, loader: Iterator[Batch], iters: int = 5) -> float:
        """(reference test_dataloader_speed, train.py:1282-1289)"""
        with Timer("dataloader", divisor=iters) as tm:
            for i, _ in enumerate(loader):
                if i + 1 >= iters:
                    break
        return tm.seconds

    def _probe_batch_size(self, b: int) -> None:
        """One full train step at batch size b (raises on failure)."""
        tcfg = dataclasses.replace(self.tcfg, batch_size=b)
        probe = Trainer(self.cfg, tcfg, mesh=self.mesh)
        st = probe.init_state()
        batch = gen_batch(self.cfg, b, tcfg.multi_step_training, seed=0)
        era5, sst = probe._device_batch(batch)
        st, m = probe._train_step(st, era5, sst)
        jax.block_until_ready(m["loss"])

    def test_batch_size(
        self, candidates: tuple[int, ...] = (1, 2, 4, 8, 16)
    ) -> int:
        """Grow batch size until OOM on synthetic data (train.py:1296-1337).

        ONLY OOM-shaped failures terminate the sweep; anything else (a shape
        bug, a dead tunnel) propagates — swallowing it would report a wrong
        max batch instead of erroring."""
        best = 0
        for b in candidates:
            try:
                self._probe_batch_size(b)
            except Exception as e:
                if not _is_oom_error(e):
                    raise
                log.info("batch size %d OOM (%s)", b, type(e).__name__)
                break
            best = b
            log.info("batch size %d OK", b)
        return best


def save_forecast(
    trainer: Trainer,
    state: TrainState,
    batches,
    steps: int,
    out_path: str,
    channels: list[str] | None = None,
) -> str:
    """Weatherbench2-format forecast dump (reference Trainer.save_forecast,
    train.py:942-1022 + save_to_zarr_forecast 1024-1110): for each validation
    init time, roll out `steps` prediction timedeltas and append one chunk
    per init time to a ForecastWriter archive."""
    import jax.numpy as jnp

    from msfno_tpu.inference.forecast_writer import ForecastWriter
    from msfno_tpu.inference.rollout import scan_rollout

    h, w = trainer.cfg.img_size
    writer = ForecastWriter(
        out_path,
        channels or [f"var{i}" for i in range(trainer.cfg.out_chans)],
        lat=np.linspace(90, -90, h),
        lon=np.linspace(0, 360, w, endpoint=False),
    )
    params = state.params
    for batch in batches:
        x0 = batch.era5[0]
        sst_seq = (
            jnp.asarray(batch.sst[1 : steps + 1]) if batch.sst is not None else None
        )
        outs = np.asarray(
            scan_rollout(
                trainer.model,
                params,
                x0,
                steps,
                sst_seq=sst_seq,
                normalizer=trainer.normalizer,
                sst_normalizer=trainer.sst_normalizer,
                scale=float(state.film_scale),
                mesh=trainer.mesh,
            )
        )
        # denormalize and append per init time: (steps, H, W, C)
        for b in range(outs.shape[1]):
            fc = np.stack(
                [
                    np.asarray(trainer.normalizer(outs[s, b], reverse=True))
                    for s in range(steps)
                ]
            )
            writer.append(int(batch.times[0, b]), fc)
    return out_path
