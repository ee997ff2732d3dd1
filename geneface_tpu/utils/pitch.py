"""Pitch quantization (``utils/commons/pitch_utils.py:1-27``)."""

from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = ["f0_to_coarse", "coarse_to_f0", "F0_BIN"]

F0_BIN = 256
F0_MAX = 1100.0
F0_MIN = 50.0
# python floats, not jnp: module import must not initialize a jax backend
_MEL_MIN = 1127 * math.log(1 + F0_MIN / 700)
_MEL_MAX = 1127 * math.log(1 + F0_MAX / 700)


def f0_to_coarse(f0):
    """Hz → coarse bin index in [1, 255]; unvoiced (f0<=0) → bin 1."""
    f0 = jnp.asarray(f0)
    mel = 1127 * jnp.log(1 + jnp.maximum(f0, 0.0) / 700)
    mel = jnp.where(
        mel > 0, (mel - _MEL_MIN) * (F0_BIN - 2) / (_MEL_MAX - _MEL_MIN) + 1, mel
    )
    mel = jnp.clip(mel, 1.0, F0_BIN - 1)
    return jnp.floor(mel + 0.5).astype(jnp.int32)


def coarse_to_f0(coarse):
    coarse = jnp.asarray(coarse)
    mel = (coarse - 1) * (_MEL_MAX - _MEL_MIN) / (F0_BIN - 2) + _MEL_MIN
    f0 = (jnp.exp(mel / 1127) - 1) * 700
    return jnp.where(coarse == 1, 0.0, f0)
