"""Audio2Pose: conditioned WaveNet emitting GMM parameters of head pose.

Flax re-implementation of ``modules/audio2pose/models.py``: an audio MLP
encoder + gated dilated-conv WaveNet over the 12-D (pose, velocity) history
producing ``(2*12+1)``-D GMM parameters per step (``models.py:11-116,
residual_block:207-313``); autoregressive inference rolls a receptive-field
window and samples the GMM each step (``autoregressive_infer:36-62``).

The TPU autoregressive loop is a ``lax.scan`` over frames with a fixed-size
rolling history (static shapes), not a python loop.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from geneface_tpu.models.audio2pose.gmm import sample_gmm

__all__ = ["Audio2PoseModel", "WaveNet", "autoregressive_infer"]


class _ResidualBlock(nn.Module):
    dilation: int
    dilation_channels: int = 128
    residual_channels: int = 128
    skip_channels: int = 256
    kernel_size: int = 2
    use_bias: bool = True
    cond_channels: int = 256

    @nn.compact
    def __call__(self, x, cond):
        """x [B, T, R]; cond [B, T, C] → (residual, skip). Causal (left) pad."""
        pad = (self.kernel_size - 1) * self.dilation
        xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        filt = nn.Conv(
            self.dilation_channels, (self.kernel_size,),
            kernel_dilation=(self.dilation,), padding="VALID",
            use_bias=self.use_bias, name="filter",
        )(xp)
        gate = nn.Conv(
            self.dilation_channels, (self.kernel_size,),
            kernel_dilation=(self.dilation,), padding="VALID",
            use_bias=self.use_bias, name="gate",
        )(xp)
        if cond is not None:
            filt = filt + nn.Conv(self.dilation_channels, (1,), name="cond_filter")(cond)
            gate = gate + nn.Conv(self.dilation_channels, (1,), name="cond_gate")(cond)
        act = jnp.tanh(filt) * jax.nn.sigmoid(gate)
        residual = nn.Conv(
            self.residual_channels, (1,), use_bias=self.use_bias, name="res"
        )(act) + x
        skip = nn.Conv(
            self.skip_channels, (1,), use_bias=self.use_bias, name="skip"
        )(act)
        return residual, skip


class WaveNet(nn.Module):
    residual_layers: int = 3
    residual_blocks: int = 2
    dilation_channels: int = 128
    residual_channels: int = 128
    skip_channels: int = 256
    kernel_size: int = 2
    input_channels: int = 12
    output_channels: int = (2 * 12 + 1) * 1
    cond_channels: int = 256

    @nn.compact
    def __call__(self, x, cond=None):
        """x [B, T, 12] pose+velocity history; cond [B, T, 256] → GMM params
        [B, T, 25]."""
        act = lambda v: nn.leaky_relu(v, negative_slope=0.2)
        h = act(nn.Conv(self.residual_channels, (1,), name="start1")(x))
        h = act(nn.Conv(self.residual_channels, (1,), name="start2")(h))
        skip = 0.0
        b_idx = 0
        for _ in range(self.residual_blocks):
            dilation = 1
            for _ in range(self.residual_layers):
                h, s = _ResidualBlock(
                    dilation, self.dilation_channels, self.residual_channels,
                    self.skip_channels, self.kernel_size,
                    cond_channels=self.cond_channels, name=f"block_{b_idx}",
                )(h, cond)
                skip = skip + s
                dilation *= 2
                b_idx += 1
        out = act(nn.Conv(self.output_channels, (1,), name="end1")(act(skip)))
        return nn.Conv(self.output_channels, (1,), name="end2")(out)

    @property
    def receptive_field(self) -> int:
        rf, scope = 1, self.kernel_size - 1
        for _ in range(self.residual_blocks):
            s = scope
            for _ in range(self.residual_layers):
                rf += s
                s *= 2
        return rf


class Audio2PoseModel(nn.Module):
    recept_field: int = 100
    audio_in_dim: int = 2 * 29

    def setup(self):
        self.audio_fc1 = nn.Dense(256)
        self.audio_fc2 = nn.Dense(256)
        self.backbone = WaveNet()

    def encode_audio(self, audio):
        h = nn.leaky_relu(self.audio_fc1(audio), negative_slope=0.2)
        return self.audio_fc2(h)

    def __call__(self, audio, history_pose_velocity):
        """audio [B, T, audio_in_dim]; history [B, T, 12] → GMM params [B, T, 25]."""
        cond = self.encode_audio(audio)
        return self.backbone(history_pose_velocity, cond)


def autoregressive_infer(
    model: Audio2PoseModel, params, long_audio, rng, init_pose=None
):
    """long_audio [T, audio_in_dim] → pred pose [T, 6]
    (``models.py:36-62``).

    ``lax.scan`` over frames: each step feeds the fixed receptive-field
    window of audio + pose history and samples the single-center GMM with
    ``sigma_scale=0`` (deterministic mean). Lives outside the module so the
    scan body is a pure function of ``params``.
    """
    R = model.recept_field
    T = long_audio.shape[0]
    audio = jnp.concatenate(
        [jnp.broadcast_to(long_audio[:1], (R - 1, long_audio.shape[-1])), long_audio],
        axis=0,
    )
    idx = jnp.arange(T)[:, None] + jnp.arange(R)[None, :]
    windows = audio[idx]  # [T, R, C]
    history0 = jnp.zeros((R, 12), jnp.float32)
    if init_pose is not None:
        history0 = history0.at[:, :6].set(jnp.asarray(init_pose)[None, :])
    keys = jax.random.split(rng, T)

    def step(history, inp):
        audio_win, key = inp
        gmm = model.apply(params, audio_win[None], history[None])[0, -1]
        sample = sample_gmm(gmm[None, None], 1, 12, key, sigma_scale=0.0)[0, 0]
        history = jnp.concatenate([history[1:], sample[None]], axis=0)
        return history, sample

    _, samples = jax.lax.scan(step, history0, (windows, keys))
    return samples[:, :6]
