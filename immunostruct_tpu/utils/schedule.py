"""LR schedules (reference: utils/scheduler.py LinearWarmupCosineAnnealingLR).

The reference steps its scheduler once per *epoch* (train.py:33-34), with a
linear warmup from ``warmup_start_lr`` to base lr over ``warmup_epochs``
followed by cosine annealing to ``eta_min`` over the remaining epochs.
The closed form (scheduler.py:124-138) is reproduced here as a pure function
of the epoch index, usable both host-side and inside jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def linear_warmup_cosine_annealing(base_lr: float, warmup_epochs: int,
                                   max_epochs: int, warmup_start_lr: float = 0.0,
                                   eta_min: float = 0.0):
    """Returns lr(epoch) matching the reference's closed-form schedule."""

    def schedule(epoch):
        epoch = jnp.asarray(epoch, jnp.float32)
        if warmup_epochs > 0:
            warm = warmup_start_lr + epoch * (base_lr - warmup_start_lr) / max(1, warmup_epochs - 1)
        else:
            warm = jnp.asarray(base_lr, jnp.float32)
        denom = max(1, max_epochs - warmup_epochs)
        cos = eta_min + 0.5 * (base_lr - eta_min) * (
            1.0 + jnp.cos(jnp.pi * (epoch - warmup_epochs) / denom))
        return jnp.where(epoch < warmup_epochs, warm, cos)

    return schedule


def constant_lr(lr: float):
    def schedule(epoch):
        return jnp.asarray(lr, jnp.float32)
    return schedule


def linear_warmup_constant(base_lr: float, warmup_epochs: int,
                           warmup_start_lr: float = 0.0):
    """Linear warmup to ``base_lr`` over ``warmup_epochs``, then constant.

    Used by the --pretrain-warmup-epochs collapse-mitigation probe (the
    reference's pretrain stages run at constant LR; warmup is this repo's
    recipe-level answer to the seed-sensitive pretrain flatline,
    benchmarks/RESULTS.md seed-variance section).

    This is the cosine schedule with zero annealing amplitude
    (eta_min == base_lr), delegated so the warmup-ramp convention (the
    ``warmup_epochs - 1`` denominator) lives in exactly one place."""
    return linear_warmup_cosine_annealing(
        base_lr, warmup_epochs, max_epochs=warmup_epochs + 1,
        warmup_start_lr=warmup_start_lr, eta_min=base_lr)
