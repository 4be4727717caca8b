"""LR schedules reproducing the reference semantics exactly.

Reference: `pycontrast/learning/base_trainer.py:80-103` — per-EPOCH cosine or
step decay (epoch is an integer, starting at 1), plus per-ITERATION linear
warmup during the first `warm_epochs` epochs; and the warmup_to derivation in
`options/train_options.py:49-64`.

Implemented as a pure function of the global step so it lives inside the
jitted train step (no host-side param-group mutation)."""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..core.config import TrainConfig


def learning_rate_fn(cfg: TrainConfig, steps_per_epoch: int):
    """Returns f(step) -> lr.  step is 0-based global iteration; epoch =
    step // steps_per_epoch + 1 (reference epochs start at 1)."""
    lr0 = cfg.learning_rate
    eta_min = lr0 * (cfg.lr_decay_rate ** 3)
    warm = cfg.warm or cfg.batch_size > 256
    warm_epochs = 10 if cfg.epochs > 500 else 5
    if warm:
        if cfg.cosine:
            warmup_to = eta_min + (lr0 - eta_min) * (
                1 + math.cos(math.pi * warm_epochs / cfg.epochs)) / 2
        else:
            warmup_to = lr0
    else:
        warmup_to = lr0

    decay_epochs = jnp.asarray(cfg.lr_decay_epochs, jnp.float32)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        epoch = jnp.floor(step / steps_per_epoch) + 1.0
        if cfg.cosine:
            lr = eta_min + (lr0 - eta_min) * (
                1 + jnp.cos(jnp.pi * epoch / cfg.epochs)) / 2
        else:
            n_decay = jnp.sum(epoch > decay_epochs)
            lr = lr0 * (cfg.lr_decay_rate ** n_decay)
        if warm:
            p = step / (warm_epochs * steps_per_epoch)
            warm_lr = cfg.warmup_from + p * (warmup_to - cfg.warmup_from)
            lr = jnp.where(epoch <= warm_epochs, warm_lr, lr)
        return lr

    return fn
