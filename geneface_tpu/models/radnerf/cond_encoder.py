"""Condition encoders for RAD-NeRF: AudioNet window reducer, AudioAttNet
temporal smoother, and the bias-free MLP.

Flax re-implementations of ``modules/radnerfs/cond_encoder.py``:
- ``AudioNet`` (``:8-52``): strided Conv1d stack reducing a feature window
  [B, W, C_in] to a single [B, C_out] vector; stride plan depends on W.
- ``AudioAttNet`` (``:55-89``): conv attention over ``seq_len`` consecutive
  per-frame features → softmax weights → weighted sum (the AD-NeRF smoother).
- ``MLP`` (``:92-111``): bias-free linear stack with ReLU (bias-free is what
  instant-ngp's fused MLPs do; keeps parity).

Convolutions use explicit (1,1) padding so output lengths match torch
``Conv1d(k=3, padding=1)`` for every stride.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["AudioNet", "AudioAttNet", "MLP"]

_STRIDE_PLANS = {
    1: (1, 1, 1, 1),
    2: (2, 1, 1, 1),
    3: (2, 2, 1, 1),
    4: (2, 2, 1, 1),
    5: (2, 2, 2, 1),
    8: (2, 2, 2, 1),
    16: (2, 2, 2, 2),
}


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.02)


class AudioNet(nn.Module):
    """[B, W, C_in] feature window → [B, dim_aud]."""

    dim_aud: int = 64
    win_size: int = 16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.win_size not in _STRIDE_PLANS:
            raise ValueError(f"unsupported win_size {self.win_size}")
        strides = _STRIDE_PLANS[self.win_size]
        # flax Conv is channel-last: [B, T, C]
        for ch, s in zip((32, 32, 64, 64), strides):
            x = nn.Conv(ch, kernel_size=(3,), strides=(s,), padding=((1, 1),))(x)
            x = _lrelu(x)
        # after the stride plan the time axis is reduced to length 1 for the
        # canonical window sizes; pool any remainder (torch squeezes dim -1)
        x = jnp.mean(x, axis=1) if x.shape[1] > 1 else x[:, 0]
        x = _lrelu(nn.Dense(64)(x))
        return nn.Dense(self.dim_aud)(x)


class AudioAttNet(nn.Module):
    """[W, C] consecutive per-frame features → attention-smoothed [C]."""

    in_out_dim: int = 64
    seq_len: int = 8

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = x[:, : self.in_out_dim][None]  # [1, W, C]
        for ch in (16, 8, 4, 2, 1):
            y = nn.Conv(ch, kernel_size=(3,), padding=((1, 1),))(y)
            y = _lrelu(y)
        y = y.reshape(1, self.seq_len)  # [1, W]
        w = nn.softmax(nn.Dense(self.seq_len)(y), axis=-1).reshape(self.seq_len, 1)
        return jnp.sum(w * x, axis=0)  # [C]


class MLP(nn.Module):
    """Bias-free ReLU MLP; ``num_layers`` linear layers total."""

    dim_out: int
    dim_hidden: int
    num_layers: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for layer in range(self.num_layers):
            is_last = layer == self.num_layers - 1
            x = nn.Dense(self.dim_out if is_last else self.dim_hidden, use_bias=False)(x)
            if not is_last:
                x = nn.relu(x)
        return x
