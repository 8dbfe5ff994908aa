"""Optimizers + LR schedules (optax), matching the reference's semantics.

Reference: configure_optimizers at /root/reference/src/train.py:234-280 —
AdamW/Adam, schedulers 'none' | 'cosine' (CosineAnnealingLR, T_max =
max_epochs, eta_min = lr/100, stepped per epoch) | 'step' (StepLR
step_size=30, gamma=0.1, per epoch).  Gradient clipping by global norm is
applied by the Lightning trainer (ref :540); here it is part of the optax
chain.  'warmup_cosine' is additionally supported — the reference's SLURM
script requests it but its code rejects the override
(/root/reference/run.slurm:120-121, error in slurm/slurm_48610692.err).
"""

from __future__ import annotations

import math
from typing import Callable

import optax


def lr_schedule(
    training_cfg, steps_per_epoch: int
) -> Callable[[int], float]:
    """Per-step schedule with per-EPOCH granularity (torch schedulers step
    once per epoch), as a pure function of the global step."""
    base_lr = float(training_cfg.learning_rate)
    kind = training_cfg.scheduler
    max_epochs = int(training_cfg.max_epochs)
    spe = max(1, int(steps_per_epoch))

    if kind == "none":
        return optax.constant_schedule(base_lr)

    if kind == "cosine":
        eta_min = base_lr / 100.0

        def cosine(step):
            import jax.numpy as jnp

            epoch = jnp.minimum(step // spe, max_epochs)
            return eta_min + 0.5 * (base_lr - eta_min) * (
                1.0 + jnp.cos(math.pi * epoch / max_epochs)
            )

        return cosine

    if kind == "step":
        size = int(training_cfg.scheduler_step_size)
        gamma = float(training_cfg.scheduler_gamma)

        def step_fn(step):
            epoch = step // spe
            return base_lr * (gamma ** (epoch // size))

        return step_fn

    if kind == "warmup_cosine":
        warmup = max(1, int(training_cfg.warmup_steps))
        total = max_epochs * spe
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=base_lr,
            warmup_steps=warmup,
            decay_steps=max(total, warmup + 1),
            end_value=base_lr / 100.0,
        )

    raise ValueError(f"Unknown scheduler: {kind}")


def build_optimizer(
    training_cfg, steps_per_epoch: int
) -> tuple[optax.GradientTransformation, Callable[[int], float]]:
    schedule = lr_schedule(training_cfg, steps_per_epoch)
    clip = float(training_cfg.gradient_clip_norm)
    wd = float(training_cfg.weight_decay)
    parts = []
    if clip and clip > 0:
        parts.append(optax.clip_by_global_norm(clip))

    if training_cfg.optimizer == "adamw":
        parts.append(optax.adamw(schedule, weight_decay=wd))
    elif training_cfg.optimizer == "adam":
        # torch Adam's weight_decay is L2 folded into the gradient *before*
        # the moment updates — add_decayed_weights placed before adam
        if wd:
            parts.append(optax.add_decayed_weights(wd))
        parts.append(optax.adam(schedule))
    else:
        raise ValueError(f"Unknown optimizer: {training_cfg.optimizer}")
    return optax.chain(*parts), schedule
