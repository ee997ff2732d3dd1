"""Transformer sequence stacks for audio2motion.

Flax re-designs of ``modules/audio2motion/transformer_base.py`` /
``transformer_models.py``: sinusoidal positions, self-attention FFT blocks
(``FFTBlocks:55``) and the style-fusion generator
(``TransformerStyleFusionModel:149``).

Layout stays ``[B, T, C]`` end to end (the torch code shuttles through
``[T, B, C]`` for fairseq compatibility — irrelevant here). Attention uses
``flax.linen.MultiHeadDotProductAttention`` (XLA fuses QKV matmuls onto the
MXU); padding is handled with an explicit boolean mask.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

__all__ = [
    "sinusoidal_positions",
    "TransformerEncoderLayer",
    "FFTBlocks",
    "TransformerStyleFusionModel",
]


def sinusoidal_positions(T: int, dim: int) -> np.ndarray:
    """fairseq-convention sinusoidal embedding table ``[T, dim]``
    (``transformer_base.py:143-183``): sin on the first half, cos on the
    second, zero-pad when dim is odd."""
    half = dim // 2
    emb = np.log(10000.0) / max(half - 1, 1)
    freqs = np.exp(np.arange(half, dtype=np.float32) * -emb)
    args = np.arange(T, dtype=np.float32)[:, None] * freqs[None, :]
    table = np.concatenate([np.sin(args), np.cos(args)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((T, 1), np.float32)], axis=1)
    return table


class TransformerEncoderLayer(nn.Module):
    """Pre-LN self-attention + conv-FFN block (``EncSALayer``,
    ``transformer_base.py:674-723``; FFN kernel 9 as ``ffn_kernel_size``)."""

    hidden_size: int
    num_heads: int = 2
    ffn_kernel_size: int = 9
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, nonpadding, deterministic: bool = True):
        # attention
        h = nn.LayerNorm(name="attn_ln")(x)
        attn_mask = nonpadding[:, None, None, :] > 0  # [B, 1, 1, T]
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.hidden_size,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            name="self_attn",
        )(h, h, mask=attn_mask)
        x = (x + h) * nonpadding[..., None]

        # conv FFN (kernel-9 conv → relu → conv, TransformerFFNLayer:591)
        h = nn.LayerNorm(name="ffn_ln")(x)
        h = nn.Conv(
            4 * self.hidden_size, (self.ffn_kernel_size,), padding="SAME",
            name="ffn_conv",
        )(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.hidden_size, name="ffn_out")(h)
        return (x + h) * nonpadding[..., None]


class FFTBlocks(nn.Module):
    """Stack of encoder layers with scaled sinusoidal positions
    (``transformer_models.py:55-116``)."""

    hidden_size: int
    num_layers: int
    num_heads: int = 2
    ffn_kernel_size: int = 9
    dropout: float = 0.1
    use_pos_embed: bool = True
    use_last_norm: bool = True

    @nn.compact
    def __call__(self, x, nonpadding=None, deterministic: bool = True):
        """x [B, T, C]; nonpadding [B, T] floats (1 = keep)."""
        if nonpadding is None:
            nonpadding = (jnp.sum(jnp.abs(x), axis=-1) > 0).astype(x.dtype)
        if self.use_pos_embed:
            alpha = self.param("pos_alpha", nn.initializers.ones, (1,))
            pos = jnp.asarray(sinusoidal_positions(x.shape[1], x.shape[2]))
            x = x + alpha * pos[None]
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = x * nonpadding[..., None]
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.hidden_size,
                self.num_heads,
                self.ffn_kernel_size,
                self.dropout,
                name=f"layer_{i}",
            )(x, nonpadding, deterministic)
        if self.use_last_norm:
            x = nn.LayerNorm(name="last_ln")(x) * nonpadding[..., None]
        return x


class TransformerStyleFusionModel(nn.Module):
    """Audio + energy + style → landmark frames at half rate
    (``transformer_models.py:149-196``)."""

    out_dim: int = 64
    num_heads: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, audio, energy, style, x_mask, deterministic: bool = True):
        """audio [B,T,29], energy [B,T,1], style [B,135], x_mask [B,T]."""
        m = x_mask[..., None]
        a = nn.Dense(48, name="audio_0")(audio) * m
        a = nn.Dense(128, name="audio_1")(nn.relu(a)) * m
        e = nn.Dense(16, name="energy_0")(energy) * m
        e = nn.Dense(64, name="energy_1")(nn.relu(e)) * m
        feat = jnp.concatenate([a, e], axis=-1)  # [B, T, 192]

        feat = FFTBlocks(192, 3, dropout=self.dropout, name="backbone1")(
            feat, x_mask, deterministic
        )
        feat = nn.Dropout(self.dropout, deterministic=deterministic)(feat)

        sty = nn.Dense(64, name="sty_0")(style)
        sty = nn.Dense(128, name="sty_1")(nn.relu(sty))
        sty = jnp.broadcast_to(
            sty[:, None, :], (feat.shape[0], feat.shape[1], sty.shape[-1])
        )
        feat = jnp.concatenate([feat, sty], axis=-1)  # [B, T, 320]
        feat = FFTBlocks(320, 3, dropout=self.dropout, name="backbone2")(
            feat, x_mask, deterministic
        )

        # T -> T/2 average pool, then the output head
        T2 = feat.shape[1] // 2
        pooled = 0.5 * (feat[:, : 2 * T2 : 2] + feat[:, 1 : 2 * T2 : 2])
        h = nn.Dense(self.out_dim, name="out_0")(pooled)
        h = nn.PReLU(name="out_prelu")(h)
        return nn.Dense(self.out_dim, name="out_1")(h)
