"""Person-specific post-net: residual conv refiner + MLP discriminator.

Flax re-implementations of ``modules/postnet/models.py``:
- ``CNNPostNet:20`` / ``PitchContourCNNPostNet:48``: 1-D conv stacks
  predicting a landmark delta, ``refined = x + Δ``; padding frames (all-zero
  feature rows) are masked out.
- ``MLPDiscriminator:77``: frame-wise real/fake head for the
  domain-adversarial LRS3→person adaptation. On TPU padded frames are masked
  (weighted) rather than boolean-compacted (static shapes).

BatchNorm → LayerNorm as elsewhere.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["CNNPostNet", "PitchContourCNNPostNet", "MLPDiscriminator"]


class _ConvBlock(nn.Module):
    cout: int
    residual: bool = False
    norm: str = "ln"  # "ln" (TPU-native default) | "bn" (imported torch ckpts)

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(self.cout, (3,), padding=((1, 1),))(x)
        if self.norm == "bn":
            # frozen running-stats BatchNorm: exact eval-mode semantics of
            # the reference's Conv1d+BatchNorm1d blocks (models.py:8-18) so
            # reference-trained checkpoints import bit-for-float
            out = nn.BatchNorm(use_running_average=True, epsilon=1e-5)(out)
        else:
            out = nn.LayerNorm()(out)
        if self.residual:
            out = out + x
        return nn.leaky_relu(out, negative_slope=0.2)


class _RefinerCore(nn.Module):
    in_out_dim: int
    norm: str = "ln"

    @nn.compact
    def __call__(self, inp, x, mask):
        h = inp
        for cout, res in [(128, False), (128, True), (128, True)]:
            h = _ConvBlock(cout, res, self.norm)(h)
        h = h * mask
        for cout, res in [(256, False), (256, True), (256, True)]:
            h = _ConvBlock(cout, res, self.norm)(h)
        h = h * mask
        h = _ConvBlock(128, False, self.norm)(h)
        delta = nn.Conv(self.in_out_dim, (1,))(h) * mask
        return x + delta


class CNNPostNet(nn.Module):
    in_out_dim: int = 64
    norm: str = "ln"

    @nn.compact
    def __call__(self, x):
        """x [B, T, C] → refined [B, T, C]."""
        mask = (jnp.sum(jnp.abs(x), -1, keepdims=True) != 0).astype(x.dtype)
        return _RefinerCore(self.in_out_dim, self.norm)(x, x, mask)


class PitchContourCNNPostNet(nn.Module):
    in_out_dim: int = 64
    pitch_dim: int = 32
    norm: str = "ln"

    @nn.compact
    def __call__(self, x, pitch):
        mask = (jnp.sum(jnp.abs(x), -1, keepdims=True) != 0).astype(x.dtype)
        inp = jnp.concatenate([x, pitch], axis=-1)
        return _RefinerCore(self.in_out_dim, self.norm)(inp, x, mask)


class MLPDiscriminator(nn.Module):
    in_dim: int = 64

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x [B, T, C] → (validity [B, T, 1], frame_mask [B, T])."""
        mask = jnp.sum(jnp.abs(x), -1) != 0
        h = x
        for dim in (128, 256, 256, 128):
            h = nn.Dense(dim)(h)
            h = nn.leaky_relu(h, negative_slope=0.2)
            h = nn.Dropout(0.25)(h, deterministic=deterministic)
        v = nn.Dense(1, use_bias=False)(h)
        return v, mask
