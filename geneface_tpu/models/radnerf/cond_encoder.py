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


class _SplitDense(nn.Module):
    """Bias-free Dense over a LIST of input parts without concatenating.

    ``Dense(concat(parts))`` ≡ ``Σ_i parts_i @ kernel[off_i:off_i+c_i]`` —
    same parameter (one ``kernel`` of the concatenated width, so checkpoints
    are interchangeable with ``nn.Dense``), but no ``[M, ΣC]`` concat is ever
    materialized. On TPU the concat is expensive twice over: the minor axis
    pads to the 128-lane tile (e.g. 96→128, 148→256 — measured ~9 ms of the
    RAD-NeRF train step's backward was concat/split cotangent traffic), and
    the concat + its cotangent split are extra HBM round-trips. Parts with a
    leading broadcast dim of 1 (per-frame condition / individual codes) stay
    tiny until the final add — the ``[M, C]`` broadcast is never stored.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, parts) -> jax.Array:
        total = sum(p.shape[-1] for p in parts)
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (total, self.features),
            jnp.float32,
        )
        k = kernel.astype(self.dtype)
        off, y = 0, None
        for p in parts:
            c = p.shape[-1]
            # f32 accumulation across partial matmuls, ONE rounding to the
            # compute dtype at the end — matches the single concat-matmul's
            # numerics (per-partial bf16 rounding measured −3.7 dB PSNR on
            # the 1500-step synthetic-scene convergence study)
            contrib = jax.lax.dot_general(
                p.astype(self.dtype),
                jax.lax.slice(k, (off, 0), (off + c, self.features)),
                (((p.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y = contrib if y is None else y + contrib
            off += c
        return y.astype(self.dtype)


class MLP(nn.Module):
    """Bias-free ReLU MLP; ``num_layers`` linear layers total.

    ``dtype`` is the compute dtype (params stay f32 master weights):
    bfloat16 feeds the MXU at full rate; instant-ngp's fused MLPs run half
    precision the same way.

    Input may be a single array or a list/tuple of parts (split first-layer
    matmul, see :class:`_SplitDense`). ``split_out`` optionally returns the
    last layer as a tuple of slices computed by slicing the KERNEL (not the
    output), so e.g. the sigma head's ``(1, geo_feat)`` split never stores a
    lane-padded ``[M, 129]`` tensor; width-1 slices come back as dense
    ``[...]`` rank-reduced columns (no ``[M, 1]`` buffer). The parameter
    tree is identical to the plain concat/slice formulation in all cases.
    """

    dim_out: int
    dim_hidden: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32
    split_out: tuple | None = None

    @nn.compact
    def __call__(self, x):
        parts = list(x) if isinstance(x, (tuple, list)) else [x]
        for layer in range(self.num_layers):
            is_last = layer == self.num_layers - 1
            if is_last and self.split_out is not None:
                assert sum(self.split_out) == self.dim_out
                # split-out: one kernel param, multiple kernel column
                # slices — keeps the Dense_<i>/kernel tree
                total = sum(p.shape[-1] for p in parts)
                kernel = _KernelHolder(
                    total, self.dim_out, name=f"Dense_{layer}"
                )()
                k = kernel.astype(self.dtype)
                outs = []
                coff = 0
                for width in self.split_out:
                    off, y = 0, None
                    kc = jax.lax.slice(k, (0, coff), (total, coff + width))
                    if width == 1:
                        # rank-1 head: produce a dense [M] column instead of
                        # a [M, 1] tensor (which the TPU layout pads to 128
                        # lanes — a 200 MB buffer at M=393k for 1.6 MB of
                        # data, round-tripped again by its cotangent)
                        kc = kc.reshape(total)
                    for p in parts:
                        c = p.shape[-1]
                        contrib = jax.lax.dot_general(
                            p.astype(self.dtype),
                            jax.lax.slice(kc, (off,), (off + c,))
                            if width == 1
                            else jax.lax.slice(kc, (off, 0), (off + c, width)),
                            (((p.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        y = contrib if y is None else y + contrib
                        off += c
                    # single rounding through the compute dtype, as the
                    # unsplit layer would produce
                    outs.append(y.astype(self.dtype).astype(jnp.float32))
                    coff += width
                return tuple(outs)
            h = _SplitDense(
                self.dim_out if is_last else self.dim_hidden,
                dtype=self.dtype,
                name=f"Dense_{layer}",
            )(parts)
            if is_last:
                return h.astype(jnp.float32)
            parts = [nn.relu(h)]
        raise AssertionError("num_layers must be >= 1")


class _KernelHolder(nn.Module):
    """Declares the same ``kernel`` param as a bias-free ``nn.Dense`` and
    returns it raw (for kernel-column-sliced output heads)."""

    total_in: int
    features: int

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.total_in, self.features),
            jnp.float32,
        )
