"""LR schedules matching the reference (``utils/nn/schedulers.py:5-206``).

Implemented as pure ``step -> lr`` functions usable with
``optax.scale_by_learning_rate``; per-group multipliers (grids ×10, attention
net ×5) live in :mod:`geneface_tpu.training.optim` via ``optax.multi_transform``
instead of torch param-group mutation.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp
import optax

__all__ = [
    "none_schedule",
    "warmup_schedule",
    "rsqrt_schedule",
    "exponential_schedule",
    "cosine_schedule",
    "build_schedule",
]

_MIN_LR = 1e-7


def none_schedule(lr: float) -> optax.Schedule:
    return lambda step: jnp.float32(lr)


def warmup_schedule(lr: float, warmup_updates: int) -> optax.Schedule:
    def fn(step):
        warm = jnp.minimum(step / max(warmup_updates, 1), 1.0)
        return jnp.maximum(lr * warm, _MIN_LR)

    return fn


def rsqrt_schedule(lr: float, warmup_updates: int, hidden_size: int) -> optax.Schedule:
    """``lr * warmup * rsqrt(step) * rsqrt(hidden)`` (``schedulers.py:24-43``)."""

    def fn(step):
        warm = jnp.minimum(step / max(warmup_updates, 1), 1.0)
        rsqrt_decay = jnp.maximum(warmup_updates, step) ** -0.5
        return jnp.maximum(lr * warm * rsqrt_decay * hidden_size**-0.5, _MIN_LR)

    return fn


def exponential_schedule(
    lr: float, warmup_updates: int = 0, decay_steps: int = 250_000
) -> optax.Schedule:
    """0.1× decay every ``decay_steps`` with optional linear warmup
    (``schedulers.py:64-84``), floored at 1e-7."""

    def fn(step):
        decayed = lr * jnp.power(0.1, step / decay_steps)
        if warmup_updates > 0:
            warm = jnp.maximum(lr * jnp.minimum(step / warmup_updates, 1.0), _MIN_LR)
            return jnp.where(step <= warmup_updates, warm, jnp.maximum(decayed, _MIN_LR))
        return jnp.maximum(decayed, _MIN_LR)

    return fn


def cosine_schedule(lr: float, warmup_updates: int, max_updates: int) -> optax.Schedule:
    def fn(step):
        warm = jnp.minimum(step / max(warmup_updates, 1), 1.0)
        progress = jnp.clip(
            (step - warmup_updates) / max(max_updates - warmup_updates, 1), 0.0, 1.0
        )
        return jnp.maximum(lr * warm * 0.5 * (1 + jnp.cos(math.pi * progress)), _MIN_LR)

    return fn


def build_schedule(cfg) -> optax.Schedule:
    """From config keys ``scheduler`` / ``lr`` / ``warmup_updates``
    (``egs_bases`` schema)."""
    name = cfg.get("scheduler", "exponential")
    lr = cfg["lr"]
    warmup = cfg.get("warmup_updates", 0)
    if name in ("none", None):
        return none_schedule(lr)
    if name == "warmup":
        return warmup_schedule(lr, warmup)
    if name == "rsqrt":
        return rsqrt_schedule(lr, warmup, cfg.get("hidden_size", 256))
    if name == "exponential":
        return exponential_schedule(lr, warmup)
    if name == "cosine":
        return cosine_schedule(lr, warmup, cfg.get("max_updates", 250_000))
    raise ValueError(f"unknown scheduler {name!r}")
