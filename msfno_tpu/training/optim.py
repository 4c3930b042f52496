"""Optimizer / scheduler factory (reference Trainer.create_optimizer /
create_scheduler, MSFNO/Models/train.py:382-431; flags main.py:849-868).

Gradient accumulation uses optax.MultiSteps, replacing the reference's manual
(i+1) % (acc+1) bookkeeping + DDP no_sync (train.py:177-185, 275-295) — under
pjit there is no gradient sync to skip; accumulation is purely local.
"""

from __future__ import annotations

import optax

from msfno_tpu.utils.config import TrainConfig


def create_schedule(cfg: TrainConfig):
    if cfg.scheduler == "none":
        return cfg.learning_rate
    if cfg.scheduler == "cosine":
        # CosineAnnealingLR over the rescaled horizon (main.py:136, train.py:388-392)
        return optax.cosine_decay_schedule(
            init_value=cfg.learning_rate, decay_steps=max(cfg.scheduler_horizon, 1)
        )
    if cfg.scheduler == "step":
        return optax.exponential_decay(
            init_value=cfg.learning_rate,
            transition_steps=max(cfg.scheduler_horizon // 3, 1),
            decay_rate=0.1,
            staircase=True,
        )
    raise ValueError(f"unknown scheduler {cfg.scheduler!r}")


def fast_forward_schedule(opt_state, step: int):
    """Set ONLY the LR-schedule position (ScaleByScheduleState.count) to
    `step`, for --resume-scheduler without --resume-optimizer (reference
    train.py:428-431 restores just the scheduler).

    Deliberately narrow: scale_by_adam also keeps a `count` (bias
    correction), and bumping it with zero mu/nu would skip the warmup
    damping and spike the first post-resume updates ~3x."""
    import jax.numpy as jnp

    def rec(node):
        if isinstance(node, optax.ScaleByScheduleState):
            return node._replace(count=jnp.asarray(step, node.count.dtype))
        if hasattr(node, "_fields"):  # other optax NamedTuple states
            return type(node)(*(rec(getattr(node, f)) for f in node._fields))
        if isinstance(node, tuple):
            return tuple(rec(x) for x in node)
        if isinstance(node, list):
            return [rec(x) for x in node]
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return node

    return rec(opt_state)


def create_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = create_schedule(cfg)
    if cfg.optimizer == "adam":
        tx = optax.adam(schedule)
    elif cfg.optimizer == "adamw":
        tx = optax.adamw(schedule, weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "sgd":
        tx = optax.sgd(schedule, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    if cfg.accumulation_steps > 0:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulation_steps + 1)
    return tx
