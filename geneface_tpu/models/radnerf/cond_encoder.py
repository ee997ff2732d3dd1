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


class Conv1dK3(nn.Module):
    """k=3 / pad=1 Conv1d expressed as one matmul over shifted views.

    The cond path's convolutions run on tiny tensors (T ≤ 16, B ≤ 8); XLA's
    TPU convolution carries ~ms-level fixed cost per op (measured ~13 ms
    per train step across the 9 convs, fwd+bwd). A [B,T,3C]@[3C,Cout] dot
    is mathematically identical and fuses into neighbors. Parameter layout
    matches ``nn.Conv`` ([3, Cin, Cout] kernel + [Cout] bias) so checkpoints
    are interchangeable.
    """

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, T, C]
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, cin, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
        T = x.shape[1]
        shifted = jnp.concatenate(
            [xp[:, 0:T], xp[:, 1 : T + 1], xp[:, 2 : T + 2]], axis=-1
        )  # [B, T, 3C]
        y = shifted @ kernel.reshape(3 * cin, self.features) + bias
        return y[:, :: self.stride]


class AudioNet(nn.Module):
    """[B, W, C_in] feature window → [B, dim_aud]."""

    dim_aud: int = 64
    win_size: int = 16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.win_size not in _STRIDE_PLANS:
            raise ValueError(f"unsupported win_size {self.win_size}")
        strides = _STRIDE_PLANS[self.win_size]
        # channel-last [B, T, C]; matmul-form conv (see Conv1dK3)
        for ch, s in zip((32, 32, 64, 64), strides):
            x = Conv1dK3(ch, stride=s)(x)
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
            y = Conv1dK3(ch)(y)
            y = _lrelu(y)
        y = y.reshape(1, self.seq_len)  # [1, W]
        w = nn.softmax(nn.Dense(self.seq_len)(y), axis=-1).reshape(self.seq_len, 1)
        return jnp.sum(w * x, axis=0)  # [C]


class MLP(nn.Module):
    """Bias-free ReLU MLP; ``num_layers`` linear layers total.

    ``dtype`` is the compute dtype (params stay f32 master weights):
    bfloat16 feeds the MXU at full rate; instant-ngp's fused MLPs run half
    precision the same way."""

    dim_out: int
    dim_hidden: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(self.dtype)
        for layer in range(self.num_layers):
            is_last = layer == self.num_layers - 1
            x = nn.Dense(
                self.dim_out if is_last else self.dim_hidden,
                use_bias=False,
                dtype=self.dtype,
            )(x)
            if not is_last:
                x = nn.relu(x)
        return x.astype(jnp.float32)
