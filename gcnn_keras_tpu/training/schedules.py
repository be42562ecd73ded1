"""Learning-rate schedules (parity: ``kgcnn/training/scheduler.py`` +
``kgcnn/training/schedule.py``), as optax schedule functions."""
from __future__ import annotations

import math

import jax.numpy as jnp
import optax


def linear_warmup_exponential_decay(lr_start: float, warmup_steps: int,
                                    decay_steps: float, decay_rate: float = 0.5,
                                    lr_min: float = 0.0):
    """LinearWarmupExponentialDecay (``kgcnn/training/schedule.py:6``)."""

    def schedule(step):
        warm = jnp.minimum(step / max(warmup_steps, 1), 1.0)
        decay = decay_rate ** ((step - warmup_steps) / decay_steps)
        lr = lr_start * warm * jnp.where(step > warmup_steps, decay, 1.0)
        return jnp.maximum(lr, lr_min)

    return schedule


def linear_learning_rate(lr_start: float, lr_stop: float, steps_total: int,
                         steps_const: int = 0):
    """LinearLearningRateScheduler (``kgcnn/training/scheduler.py:245``):
    constant, then linear decay to lr_stop."""

    def schedule(step):
        frac = jnp.clip((step - steps_const) / max(steps_total - steps_const, 1), 0.0, 1.0)
        return lr_start + (lr_stop - lr_start) * frac

    return schedule


def linear_warmup_linear_decay(lr_start: float, lr_stop: float,
                               warmup_steps: int, steps_total: int):
    """LinearWarmupLinearLearningRateScheduler (scheduler.py:304)."""

    def schedule(step):
        warm = jnp.minimum(step / max(warmup_steps, 1), 1.0)
        frac = jnp.clip((step - warmup_steps) / max(steps_total - warmup_steps, 1), 0.0, 1.0)
        return warm * (lr_start + (lr_stop - lr_start) * frac)

    return schedule


def cosine_annealing(lr_start: float, steps_total: int, lr_min: float = 0.0):
    """CosineAnnealingLRScheduler (scheduler.py:99)."""

    def schedule(step):
        frac = jnp.clip(step / max(steps_total, 1), 0.0, 1.0)
        return lr_min + 0.5 * (lr_start - lr_min) * (1 + jnp.cos(math.pi * frac))

    return schedule


def get_schedule(name: str, **kwargs):
    table = {
        "linear_warmup_exponential_decay": linear_warmup_exponential_decay,
        "linear": linear_learning_rate,
        "linear_warmup_linear": linear_warmup_linear_decay,
        "cosine_annealing": cosine_annealing,
        "constant": lambda lr, **kw: optax.constant_schedule(lr),
    }
    return table[name](**kwargs)
