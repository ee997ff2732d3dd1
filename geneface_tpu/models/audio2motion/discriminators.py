"""Multi-window 1-D discriminators for adversarial landmark-sequence training.

Flax re-implementations of ``modules/audio2motion/multi_length_disc.py``:
``Discriminator1DFactory:9`` (strided conv tower per window length),
``CosineDiscriminator1DFactory:97`` (two-tower cosine variant),
``MultiWindowDiscriminator:158`` (random same-start clips at several window
lengths, summed validity) and the top-level ``Discriminator:273`` with a mel
conv encoder conditioning.

TPU notes: clip start offsets are drawn host-side (or via rng passed in) so
the jitted forward sees static window shapes; norms are LayerNorm.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "Discriminator1DFactory",
    "CosineDiscriminator1DFactory",
    "MultiWindowDiscriminator",
    "Discriminator",
]


class Discriminator1DFactory(nn.Module):
    time_length: int
    kernel_size: int = 3
    in_dim: int = 64
    hidden_size: int = 128

    @nn.compact
    def __call__(self, x, deterministic=True):
        """x [B, T, C] → (validity [B, 1], hiddens list)."""
        h_list = []
        if self.time_length >= 8:
            h = x
            for i in range(3):
                h = nn.Conv(
                    self.hidden_size, (self.kernel_size,), strides=(2,),
                    padding=((self.kernel_size // 2,) * 2,),
                )(h)
                h = nn.leaky_relu(h, negative_slope=0.2)
                h = nn.Dropout(0.25)(h, deterministic=deterministic)
                if i > 0:
                    h = nn.LayerNorm()(h)
                h_list.append(h)
            flat = h.reshape(h.shape[0], -1)
            validity = nn.Dense(1)(flat)
        elif self.time_length == 3:
            h = nn.Conv(self.hidden_size, (3,), padding="VALID")(x)
            h = nn.leaky_relu(h, negative_slope=0.2)
            h = nn.Dropout(0.25)(h, deterministic=deterministic)
            for _ in range(2):
                h = nn.Conv(self.hidden_size, (1,))(h)
                h = nn.leaky_relu(h, negative_slope=0.2)
                h = nn.Dropout(0.25)(h, deterministic=deterministic)
                h = nn.LayerNorm()(h)
            h_list.append(h)
            validity = nn.Dense(1)(h.reshape(h.shape[0], -1))
        elif self.time_length == 1:
            h = x.reshape(x.shape[0], -1)
            for _ in range(2):
                h = nn.Dense(self.hidden_size)(h)
                h = nn.leaky_relu(h, negative_slope=0.2)
                h = nn.Dropout(0.25)(h, deterministic=deterministic)
            h_list.append(h)
            validity = jax.nn.sigmoid(nn.Dense(1)(h))
        else:
            raise ValueError(f"unsupported time_length {self.time_length}")
        return validity, h_list


class CosineDiscriminator1DFactory(nn.Module):
    """Two conv towers whose flattened outputs are compared by cosine
    similarity (``multi_length_disc.py:97-156``)."""

    time_length: int
    kernel_size: int = 3
    in_dim: int = 64
    hidden_size: int = 128

    @nn.compact
    def __call__(self, x1, x2, deterministic=True):
        def tower(x, name):
            h = x
            hs = []
            for i in range(3):
                h = nn.Conv(
                    self.hidden_size, (self.kernel_size,), strides=(2,),
                    padding=((self.kernel_size // 2,) * 2,), name=f"{name}_conv{i}",
                )(h)
                h = nn.leaky_relu(h, negative_slope=0.2)
                h = nn.Dropout(0.25)(h, deterministic=deterministic)
                if i > 0:
                    h = nn.LayerNorm(name=f"{name}_ln{i}")(h)
                hs.append(h)
            return h.reshape(h.shape[0], -1), hs

        f1, h1 = tower(x1, "a")
        f2, h2 = tower(x2, "b")
        f1 = f1 / jnp.maximum(jnp.linalg.norm(f1, axis=-1, keepdims=True), 1e-8)
        f2 = f2 / jnp.maximum(jnp.linalg.norm(f2, axis=-1, keepdims=True), 1e-8)
        validity = jnp.sum(f1 * f2, axis=-1, keepdims=True)
        return validity, h1 + h2


class MultiWindowDiscriminator(nn.Module):
    time_lengths: Sequence[int] = (8, 16, 32)
    cond_dim: int = 64
    in_dim: int = 64
    kernel_size: int = 3
    hidden_size: int = 128
    disc_type: str = "standard"

    def setup(self):
        self.factories = [
            Discriminator1DFactory(t, self.kernel_size, 64, self.hidden_size)
            if self.disc_type == "standard"
            else CosineDiscriminator1DFactory(t, self.kernel_size, 64, self.hidden_size)
            for t in self.time_lengths
        ]
        if self.cond_dim > 0:
            self.cond_projs = [nn.Dense(64) for _ in self.time_lengths]
            self.in_projs = [nn.Dense(64) for _ in self.time_lengths]

    def __call__(self, x, x_len, cond=None, start_frames=None, deterministic=True):
        """x [B, T, C]; x_len [B]; start_frames: per-window clip starts [W]
        (host-provided ints; required for jit-static clip windows)."""
        validity = 0.0
        T = x.shape[1]
        for i, win in enumerate(self.time_lengths):
            start = 0 if start_frames is None else int(start_frames[i])
            start = max(0, min(start, T - win))
            x_clip = jax.lax.dynamic_slice_in_dim(x, start, win, axis=1)
            c_clip = (
                jax.lax.dynamic_slice_in_dim(cond, start, win, axis=1)
                if cond is not None
                else None
            )
            if self.cond_dim > 0 and c_clip is not None:
                xi = self.in_projs[i](x_clip)
                ci = self.cond_projs[i](c_clip)
                if self.disc_type == "cosine":
                    v, _ = self.factories[i](xi, ci, deterministic)
                else:
                    v, _ = self.factories[i](xi + ci, deterministic)
            else:
                v, _ = self.factories[i](x_clip, deterministic)
            validity = validity + v
        return validity


class Discriminator(nn.Module):
    """Top-level sequence discriminator w/ mel conditioning
    (``multi_length_disc.py:273-340``)."""

    x_dim: int = 1024  # hubert
    y_dim: int = 64
    time_lengths: Sequence[int] = (8, 16, 32)
    disc_type: str = "standard"
    uncond_disc: bool = False
    hidden_size: int = 128

    def setup(self):
        if not self.uncond_disc:
            self.mel_conv1 = nn.Conv(64, (3,), padding="SAME", use_bias=False)
            self.mel_ln = nn.LayerNorm()
            self.mel_conv2 = nn.Conv(64, (3,), padding="SAME", use_bias=False)
        self.disc = MultiWindowDiscriminator(
            time_lengths=self.time_lengths,
            in_dim=self.y_dim,
            cond_dim=0 if self.uncond_disc else 64,
            hidden_size=self.hidden_size,
            disc_type=self.disc_type,
        )

    def __call__(self, x, mel=None, start_frames=None, deterministic=True):
        """x [B, T, C_y] landmark seq; mel [B, 2T, C_x] → validity [B, 1]."""
        cond = None
        if not self.uncond_disc:
            m = mel[:, ::2]  # 2x nearest downsample
            m = self.mel_conv2(nn.gelu(self.mel_ln(self.mel_conv1(m))))
            cond = m
        x_len = jnp.sum(jnp.sum(jnp.abs(x), -1) != 0, axis=-1)
        return self.disc(x, x_len, cond, start_frames, deterministic)
