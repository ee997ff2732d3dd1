"""Landmark/HuBERT SyncNet: two-tower clip embedder + cosine-BCE sync loss.

Flax re-implementation of ``modules/syncnet/models.py:22-101``: a HuBERT
tower over 10-frame audio clips and a mouth-landmark tower over 5-frame
clips, both reduced to a single L2-normalized 512-D embedding; sync loss is
BCE on cosine similarity. BatchNorm → LayerNorm (pjit-friendly; same
normalization capability).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["LandmarkHubertSyncNet", "sync_loss"]


class ConvBlock(nn.Module):
    cout: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    residual: bool = False
    norm: str = "ln"  # "ln" (TPU-native default) | "bn" (imported torch ckpts)

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(
            self.cout, (self.kernel,), strides=(self.stride,),
            padding=((self.padding, self.padding),),
        )(x)
        if self.norm == "bn":
            # frozen running-stats BatchNorm = eval-mode semantics of the
            # reference's Conv1d+BatchNorm1d (models.py:6-20), for importing
            # reference-trained checkpoints
            out = nn.BatchNorm(use_running_average=True, epsilon=1e-5)(out)
        else:
            out = nn.LayerNorm()(out)
        if self.residual:
            out = out + x
        return nn.relu(out)


def _tower(x, plan, norm):
    for cout, k, s, p, res in plan:
        x = ConvBlock(cout, k, s, p, res, norm)(x)
    return x


class LandmarkHubertSyncNet(nn.Module):
    lm_dim: int = 60  # mouth-only landmarks 20*3; 204 for full-face variant
    norm: str = "ln"

    @nn.compact
    def __call__(self, hubert, mouth_lm):
        """hubert [B, 10, 1024], mouth_lm [B, 5, lm_dim] →
        (audio_emb [B, 512], mouth_emb [B, 512]), L2-normalized."""
        audio_plan = [
            (128, 3, 1, 1, False),
            (128, 3, 1, 1, False), (128, 3, 1, 1, True), (128, 3, 1, 1, True),
            (256, 3, 2, 1, False), (256, 3, 1, 1, True), (256, 3, 1, 1, True),
            (512, 3, 2, 1, False), (512, 3, 1, 1, True), (512, 3, 1, 1, True),
            (512, 3, 1, 1, False), (512, 3, 1, 0, False), (512, 1, 1, 0, False),
        ]
        mouth_plan = [
            (96, 3, 1, 1, False),
            (128, 3, 1, 1, False), (128, 3, 1, 1, True), (128, 3, 1, 1, True),
            (256, 3, 2, 1, False), (256, 3, 1, 1, True), (256, 3, 1, 1, True),
            (512, 3, 1, 1, False), (512, 3, 1, 1, True), (512, 3, 1, 1, True),
            (512, 3, 1, 1, False), (512, 3, 1, 0, False), (512, 1, 1, 0, False),
        ]
        a = _tower(hubert, audio_plan, self.norm).reshape(hubert.shape[0], -1)
        m = _tower(mouth_lm, mouth_plan, self.norm).reshape(mouth_lm.shape[0], -1)
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-8)
        m = m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-8)
        return a, m


def sync_loss(audio_emb, mouth_emb, label):
    """BCE on cosine similarity (``models.py:81-89``); label ∈ {0,1} [B]."""
    # both towers end in ReLU, so the cosine is non-negative — the reference
    # feeds it to BCELoss directly (models.py:87)
    d = jnp.sum(audio_emb * mouth_emb, axis=-1)
    d = jnp.clip(d, 1e-7, 1 - 1e-7)
    label = jnp.asarray(label, jnp.float32)
    loss = -(label * jnp.log(d) + (1 - label) * jnp.log(1 - d))
    return jnp.mean(loss), d
