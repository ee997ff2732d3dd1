"""Normalizing-flow building blocks (WaveNet coupling flows / Glow).

Flax re-implementations of ``modules/audio2motion/flow_base.py``: the gated
dilated-conv ``WN`` stack (``:21-120``), VITS-style residual coupling layers
and block (``:614-700``), ``Flip``, and the Glow stack (``ActNorm:185``,
``InvConvNear:231``, ``CouplingBlock:399``, ``Glow:706``).

Conventions (differ from torch deliberately):
- channel-LAST everywhere: ``x [B, T, C]``, ``mask [B, T, 1]`` (flax Conv
  layout; time-major keeps TPU tiling tight for long sequences).
- no weight-norm reparametrization (plain kernels; weight norm is an
  optimization trick, not a capability).
- ``InvConvNear`` uses a dense invertible matrix + ``slogdet`` rather than
  the LU parametrization (equivalent function, simpler inverse).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "WN",
    "ResidualCouplingLayer",
    "ResidualCouplingBlock",
    "Flip",
    "ActNorm",
    "InvConvNear",
    "CouplingBlock",
    "Glow",
]


def _zeros_conv(features):
    """1×1 conv initialized to zero (coupling-layer stabilizer,
    ``flow_base.py:418-421``)."""
    return nn.Conv(
        features, (1,), kernel_init=nn.initializers.zeros,
        bias_init=nn.initializers.zeros,
    )


class WN(nn.Module):
    """Gated dilated conv stack with 1×1 conditioning (``flow_base.py:21-120``)."""

    hidden_channels: int
    kernel_size: int = 3
    dilation_rate: int = 1
    n_layers: int = 5
    gin_channels: int = 0
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, deterministic=True):
        """x [B, T, H]; mask [B, T, 1] or None; g [B, T, C_g] or None."""
        H = self.hidden_channels
        if x_mask is None:
            x_mask = jnp.ones_like(x[..., :1])
        if g is not None and self.gin_channels:
            g_all = nn.Conv(2 * H * self.n_layers, (1,), name="cond_layer")(g)
        else:
            g_all = None
        output = jnp.zeros_like(x)
        for i in range(self.n_layers):
            dilation = self.dilation_rate**i
            x_in = nn.Conv(
                2 * H, (self.kernel_size,), kernel_dilation=(dilation,),
                padding="SAME", name=f"in_{i}",
            )(x)
            if self.p_dropout > 0:
                x_in = nn.Dropout(self.p_dropout)(x_in, deterministic=deterministic)
            if g_all is not None:
                g_l = g_all[..., i * 2 * H : (i + 1) * 2 * H]
            else:
                g_l = jnp.zeros_like(x_in)
            acts_in = x_in + g_l
            acts = jnp.tanh(acts_in[..., :H]) * jax.nn.sigmoid(acts_in[..., H:])
            res_skip_ch = 2 * H if i < self.n_layers - 1 else H
            res_skip = nn.Conv(res_skip_ch, (1,), name=f"res_skip_{i}")(acts)
            if i < self.n_layers - 1:
                x = (x + res_skip[..., :H]) * x_mask
                output = output + res_skip[..., H:]
            else:
                output = output + res_skip
        return output * x_mask


class ResidualCouplingLayer(nn.Module):
    """Half-channel affine (mean-only by default) coupling
    (``flow_base.py:614-668``)."""

    channels: int
    hidden_channels: int
    kernel_size: int = 3
    dilation_rate: int = 1
    n_layers: int = 4
    gin_channels: int = 0
    mean_only: bool = True

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse=False):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = nn.Conv(self.hidden_channels, (1,), name="pre")(x0) * x_mask
        h = WN(
            self.hidden_channels, self.kernel_size, self.dilation_rate,
            self.n_layers, self.gin_channels, name="enc",
        )(h, x_mask, g)
        stats = _zeros_conv(half * (2 - self.mean_only))(h) * x_mask
        if self.mean_only:
            m, logs = stats, jnp.zeros_like(stats)
        else:
            m, logs = stats[..., :half], stats[..., half:]
        if not reverse:
            x1 = (m + x1 * jnp.exp(logs)) * x_mask
            logdet = jnp.sum(logs, axis=(1, 2))
        else:
            x1 = (x1 - m) * jnp.exp(-logs) * x_mask
            logdet = -jnp.sum(logs, axis=(1, 2))
        return jnp.concatenate([x0, x1], axis=-1), logdet


class Flip(nn.Module):
    @nn.compact
    def __call__(self, x, x_mask=None, g=None, reverse=False):
        return jnp.flip(x, axis=-1), jnp.zeros(x.shape[0], x.dtype)


class ResidualCouplingBlock(nn.Module):
    """``n_flows`` × (coupling + flip) (``flow_base.py:670-704``)."""

    channels: int
    hidden_channels: int
    kernel_size: int = 3
    dilation_rate: int = 1
    n_layers: int = 4
    n_flows: int = 4
    gin_channels: int = 0

    def setup(self):
        self.couplings = [
            ResidualCouplingLayer(
                self.channels, self.hidden_channels, self.kernel_size,
                self.dilation_rate, self.n_layers,
                gin_channels=self.gin_channels, mean_only=True,
            )
            for _ in range(self.n_flows)
        ]

    def __call__(self, x, x_mask, g=None, reverse=False):
        order = range(self.n_flows) if not reverse else reversed(range(self.n_flows))
        for i in order:
            if not reverse:
                x, _ = self.couplings[i](x, x_mask, g=g, reverse=False)
                x = jnp.flip(x, axis=-1)
            else:
                x = jnp.flip(x, axis=-1)
                x, _ = self.couplings[i](x, x_mask, g=g, reverse=True)
        return x


class ActNorm(nn.Module):
    """Per-channel affine with logdet (``flow_base.py:185-228``; the
    data-dependent init is omitted — plain zero init, as the reference's
    default ``ddi=False`` path)."""

    channels: int

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, reverse=False):
        if x_mask is None:
            x_mask = jnp.ones_like(x[..., :1])
        logs = self.param("logs", nn.initializers.zeros, (1, 1, self.channels))
        bias = self.param("bias", nn.initializers.zeros, (1, 1, self.channels))
        x_len = jnp.sum(x_mask, axis=(1, 2))
        if reverse:
            z = (x - bias) * jnp.exp(-logs) * x_mask
            logdet = jnp.sum(-logs) * x_len
        else:
            z = (bias + jnp.exp(logs) * x) * x_mask
            logdet = jnp.sum(logs) * x_len
        return z, logdet


class InvConvNear(nn.Module):
    """Invertible 1×1 conv over ``n_split`` channel groups
    (``flow_base.py:231-330``)."""

    channels: int
    n_split: int = 4

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, reverse=False):
        B, T, C = x.shape
        S = self.n_split

        def init_w(rng):
            w = jax.random.normal(rng, (S, S))
            q, _ = jnp.linalg.qr(w)
            q = jnp.where(jnp.linalg.det(q) < 0, q.at[:, 0].mul(-1.0), q)
            return q

        weight = self.param("weight", init_w)
        if x_mask is None:
            x_mask = jnp.ones((B, T, 1), x.dtype)
            x_len = jnp.full((B,), T, x.dtype)
        else:
            x_len = jnp.sum(x_mask, axis=(1, 2))

        # channel grouping as flow_base.py:300-310: C -> (2, C//S, S//2),
        # permuted so the invertible matrix mixes an S-sized axis
        xg = x.reshape(B, T, 2, C // S, S // 2)
        xg = xg.transpose(0, 1, 2, 4, 3).reshape(B, T, S, C // S)
        w = jnp.linalg.inv(weight) if reverse else weight
        z = jnp.einsum("btsc,ks->btkc", xg, w)
        z = z.reshape(B, T, 2, S // 2, C // S).transpose(0, 1, 2, 4, 3)
        z = z.reshape(B, T, C) * x_mask
        _, logabsdet = jnp.linalg.slogdet(weight)
        logdet = (-1.0 if reverse else 1.0) * logabsdet * (C / S) * x_len
        return z, logdet


class CouplingBlock(nn.Module):
    """Affine coupling on channel halves with WN core
    (``flow_base.py:399-455``)."""

    in_channels: int
    hidden_channels: int
    kernel_size: int = 3
    dilation_rate: int = 1
    n_layers: int = 4
    gin_channels: int = 0
    sigmoid_scale: bool = False

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, reverse=False):
        if x_mask is None:
            x_mask = jnp.ones_like(x[..., :1])
        half = self.in_channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = nn.Conv(self.hidden_channels, (1,), name="start")(x0) * x_mask
        h = WN(
            self.hidden_channels, self.kernel_size, self.dilation_rate,
            self.n_layers, self.gin_channels, name="wn",
        )(h, x_mask, g)
        out = _zeros_conv(self.in_channels)(h)
        m, logs = out[..., :half], out[..., half:]
        if self.sigmoid_scale:
            logs = jnp.log(1e-6 + jax.nn.sigmoid(logs + 2))
        if reverse:
            z1 = (x1 - m) * jnp.exp(-logs) * x_mask
            logdet = -jnp.sum(logs * x_mask, axis=(1, 2))
        else:
            z1 = (m + jnp.exp(logs) * x1) * x_mask
            logdet = jnp.sum(logs * x_mask, axis=(1, 2))
        return jnp.concatenate([x0, z1], axis=-1), logdet


class Glow(nn.Module):
    """ActNorm → InvConvNear → CouplingBlock, ``n_blocks`` times with
    optional time squeeze (``flow_base.py:706-817``)."""

    in_channels: int
    hidden_channels: int
    kernel_size: int = 3
    dilation_rate: int = 1
    n_blocks: int = 4
    n_layers: int = 4
    n_split: int = 4
    n_sqz: int = 2
    gin_channels: int = 0
    sigmoid_scale: bool = False

    def setup(self):
        ch = self.in_channels * self.n_sqz
        self.actnorms = [ActNorm(ch) for _ in range(self.n_blocks)]
        self.invconvs = [InvConvNear(ch, self.n_split) for _ in range(self.n_blocks)]
        self.couplings = [
            CouplingBlock(
                ch, self.hidden_channels, self.kernel_size, self.dilation_rate,
                self.n_layers, self.gin_channels * self.n_sqz, self.sigmoid_scale,
            )
            for _ in range(self.n_blocks)
        ]

    def __call__(self, x, x_mask=None, g=None, reverse=False):
        """x [B, T, C]; returns (z [B, T, C], logdet [B])."""
        B, T, C = x.shape
        if x_mask is None:
            x_mask = jnp.ones((B, T, 1), x.dtype)
        if self.n_sqz > 1:
            T2 = (T // self.n_sqz) * self.n_sqz
            x = x[:, :T2].reshape(B, T2 // self.n_sqz, self.n_sqz * C)
            if g is not None:
                g = g[:, :T2].reshape(B, T2 // self.n_sqz, self.n_sqz * g.shape[-1])
            x_mask_s = x_mask[:, self.n_sqz - 1 : T2 : self.n_sqz]
        else:
            x_mask_s = x_mask
        logdet_tot = jnp.zeros(B, x.dtype)
        order = range(self.n_blocks) if not reverse else reversed(range(self.n_blocks))
        for i in order:
            stages = (
                (self.actnorms[i], self.invconvs[i], self.couplings[i])
                if not reverse
                else (self.couplings[i], self.invconvs[i], self.actnorms[i])
            )
            for stage in stages:
                x, logdet = stage(x, x_mask_s, g=g, reverse=reverse)
                logdet_tot = logdet_tot + logdet
        if self.n_sqz > 1:
            x = x.reshape(B, -1, C)
            pad = T - x.shape[1]
            if pad:
                x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        return x, logdet_tot
