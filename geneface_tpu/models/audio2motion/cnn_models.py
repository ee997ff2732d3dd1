"""1-D convolutional sequence generators — alternative audio2motion backbones.

Flax re-designs of ``modules/audio2motion/cnn_models.py``: ``ResidualBlock:44``,
``ConvBlocks:88``, ``SeqLevelConvolutionalModel:132`` and the three backbones
(``ResBlocksBackbone:208``, ``ResNetBackbone:252``, ``UNetBackbone:302``).

Layout is channel-last ``[B, T, C]`` throughout (TPU conv layouts; the torch
code is channel-first). Normalization is LayerNorm regardless of the
reference's ``norm_type='bn'`` default — BatchNorm's mutable running stats
would make the train step impure; LN is the reference's own alternative
(``norm_type='ln'``) and keeps everything a pure function (deliberate
divergence).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "ResidualBlock",
    "ConvBlocks",
    "ResBlocksBackbone",
    "ResNetBackbone",
    "UNetBackbone",
    "SeqLevelConvolutionalModel",
]


def _resample_time(x: jax.Array, scale: float) -> jax.Array:
    """Linear resample along T (torch ``F.interpolate(mode='linear')``)."""
    B, T, C = x.shape
    new_t = int(T * scale)
    return jax.image.resize(x, (B, new_t, C), method="linear")


class ResidualBlock(nn.Module):
    """``n`` dilated conv layers with GLU-style gating and a residual skip
    (``cnn_models.py:44-85``)."""

    channels: int
    kernel_size: int = 3
    dilation: int = 1
    n: int = 2
    c_multiple: int = 2

    @nn.compact
    def __call__(self, x):
        for i in range(self.n):
            h = nn.LayerNorm(name=f"norm_{i}")(x)
            h = nn.Conv(
                self.c_multiple * self.channels,
                (self.kernel_size,),
                kernel_dilation=(self.dilation,),
                padding="SAME",
                use_bias=False,
                name=f"conv_{i}",
            )(h)
            h = nn.gelu(h)
            h = nn.Conv(
                self.channels, (1,), use_bias=False, name=f"proj_{i}"
            )(h)
            x = x + h
        return x


class ConvBlocks(nn.Module):
    """Stack of residual blocks + last norm + output conv
    (``cnn_models.py:88-129``). Zero-padded (all-zero) frames are re-masked
    after every stage, as the reference's ``nonpadding`` trick."""

    channels: int
    out_dims: int
    dilations: Sequence[int]
    kernel_size: int = 3
    layers_in_block: int = 2
    c_multiple: int = 2

    @nn.compact
    def __call__(self, x):
        nonpadding = (jnp.sum(jnp.abs(x), axis=-1, keepdims=True) > 0).astype(
            x.dtype
        )
        if x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, (1,), use_bias=False, name="in_proj")(x)
        for i, d in enumerate(self.dilations):
            x = ResidualBlock(
                self.channels,
                self.kernel_size,
                d,
                n=self.layers_in_block,
                c_multiple=self.c_multiple,
                name=f"res_{i}",
            )(x)
            x = x * nonpadding
        x = nn.LayerNorm(name="last_norm")(x) * nonpadding
        x = nn.Conv(
            self.out_dims, (3,), padding="SAME", use_bias=False, name="post"
        )(x)
        return x * nonpadding


class ResBlocksBackbone(nn.Module):
    """T → T/2 conv backbone with style injection (``cnn_models.py:208-249``)."""

    out_dim: int = 512
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, sty, x_mask, deterministic: bool = True):
        m = x_mask[..., None]
        x = ConvBlocks(x.shape[-1], 64, [1] * 3, name="rb0")(x) * m

        x = _resample_time(x, 0.5)
        m = _resample_time(m, 0.5)
        x = ConvBlocks(64, 128, [1] * 4, name="rb1")(x * m) * m
        x = ConvBlocks(128, 256, [1] * 14, name="rb2")(x) * m

        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        sty_t = jnp.broadcast_to(
            sty[:, None, :], (x.shape[0], x.shape[1], sty.shape[-1])
        )
        x = jnp.concatenate([x, sty_t], axis=-1)
        x = ConvBlocks(512, 512, [1] * 3, name="rb3")(x) * m
        x = ConvBlocks(512, self.out_dim, [1] * 3, name="rb4")(x) * m
        return x, m[..., 0]


class ResNetBackbone(nn.Module):
    """T → T/8 → T/2 encoder/decoder (``cnn_models.py:252-299``)."""

    out_dim: int = 512
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, sty, x_mask, deterministic: bool = True):
        m = x_mask[..., None]
        x = ConvBlocks(x.shape[-1], 64, [1] * 3, name="rb0")(x) * m

        x, m = _resample_time(x, 0.5), _resample_time(m, 0.5)
        x = ConvBlocks(64, 128, [1] * 4, name="rb1")(x * m) * m
        x, m = _resample_time(x, 0.5), _resample_time(m, 0.5)
        x = ConvBlocks(128, 256, [1] * 14, name="rb2")(x * m) * m
        x, m = _resample_time(x, 0.5), _resample_time(m, 0.5)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x * m)
        sty_t = jnp.broadcast_to(
            sty[:, None, :], (x.shape[0], x.shape[1], sty.shape[-1])
        )
        x = jnp.concatenate([x, sty_t], axis=-1)
        x = ConvBlocks(512, 512, [1] * 3, name="rb3")(x) * m

        x, m = _resample_time(x, 4.0), _resample_time(m, 4.0)
        x = ConvBlocks(512, self.out_dim, [1] * 3, name="rb4")(x * m) * m
        return x, m[..., 0]


class UNetBackbone(nn.Module):
    """U-Net with skip concatenation (``cnn_models.py:302-355``)."""

    out_dim: int = 512
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, sty, x_mask, deterministic: bool = True):
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        m = x_mask[..., None]
        x0 = ConvBlocks(x.shape[-1], 64, [1] * 3, name="rb0")(x) * m

        m1 = _resample_time(m, 0.5)
        x1 = ConvBlocks(64, 128, [1] * 4, name="rb1")(_resample_time(x0, 0.5) * m1) * m1
        m2 = _resample_time(m1, 0.5)
        x2 = ConvBlocks(128, 256, [1] * 8, name="rb2")(_resample_time(x1, 0.5) * m2) * m2
        m3 = _resample_time(m2, 0.5)
        x = drop(_resample_time(x2, 0.5) * m3)
        sty_t = jnp.broadcast_to(
            sty[:, None, :], (x.shape[0], x.shape[1], sty.shape[-1])
        )
        x = jnp.concatenate([x, sty_t], axis=-1)
        x3 = ConvBlocks(512, 512, [1] * 3, name="rb3")(x) * m3

        x = _resample_time(x3, 2.0) * m2
        x = jnp.concatenate([x, drop(x2)], axis=-1)  # 512 + 256
        x4 = ConvBlocks(768, 512, [1] * 3, name="rb4")(x) * m2

        x = _resample_time(x4, 2.0) * m1
        x = jnp.concatenate([x, drop(x1)], axis=-1)  # 512 + 128
        x5 = ConvBlocks(640, self.out_dim, [1] * 3, name="rb5")(x) * m1
        return x5, m1[..., 0]


class SeqLevelConvolutionalModel(nn.Module):
    """Sequence-level conv generator: audio (+energy) encoder + style encoder
    + backbone + out layer (``cnn_models.py:132-205``). Emits landmark frames
    at half the input rate ``[B, T/2, out_dim]``."""

    out_dim: int = 64
    audio_feat_type: str = "ppg"  # "ppg" | "mel"
    backbone_type: str = "unet"  # "unet" | "resnet" | "resblocks"
    dropout: float = 0.5

    @nn.compact
    def __call__(self, batch: dict, deterministic: bool = True):
        x_mask = batch["x_mask"]  # [B, T]
        sty = batch["style"]  # [B, 135]
        sty = nn.Dense(256, name="style_0")(sty)
        sty = nn.Dense(256, name="style_1")(nn.gelu(sty))

        def enc(x, ch, name):
            h = nn.Conv(ch, (3,), padding="SAME", use_bias=False, name=f"{name}_0")(x)
            h = nn.gelu(nn.LayerNorm(name=f"{name}_ln")(h))
            return nn.Conv(ch, (3,), padding="SAME", use_bias=False, name=f"{name}_1")(h)

        if self.audio_feat_type == "ppg":
            audio_feat = enc(batch["audio"], 48, "audio_enc") * x_mask[..., None]
            energy_feat = enc(batch["energy"], 16, "energy_enc") * x_mask[..., None]
            feat = jnp.concatenate([audio_feat, energy_feat], axis=-1)
        elif self.audio_feat_type == "mel":
            feat = enc(batch["mel"], 64, "mel_enc") * x_mask[..., None]
        else:
            raise ValueError(self.audio_feat_type)

        backbone = {
            "unet": UNetBackbone,
            "resnet": ResNetBackbone,
            "resblocks": ResBlocksBackbone,
        }[self.backbone_type](dropout=self.dropout, name="backbone")
        feat, out_mask = backbone(feat, sty, x_mask, deterministic=deterministic)

        h = nn.LayerNorm(name="out_ln")(feat)
        h = nn.Conv(64, (3,), padding="SAME", use_bias=False, name="out_0")(h)
        h = nn.PReLU(name="out_prelu")(h)
        out = nn.Conv(
            self.out_dim, (3,), padding="SAME", use_bias=False, name="out_1"
        )(h)
        return out * out_mask[..., None], out_mask
