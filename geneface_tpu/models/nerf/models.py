"""Vanilla NeRF model family: ADNeRF, Lm3dNeRF, ADNeRFTorso.

Flax re-implementations of ``modules/nerfs/adnerf/{adnerf,adnerf_torso}.py``
and ``modules/nerfs/lm3d_nerf/lm3d_nerf.py``:

- ``ADNeRF``: DeepSpeech-feature-conditioned coarse+fine backbones with
  AudioNet/AudioAttNet (``adnerf.py:9-41``).
- ``Lm3dNeRF``: 3-D-landmark-conditioned variant — cond is 68×3 idexp lm3d,
  encoded by an AudioNet-style window reducer or a plain MLP
  (``lm3d_nerf.py:13-57``).
- ``ADNeRFTorso``: torso field additionally conditioned on freq-encoded head
  pose (euler+trans, multires 6) and optionally the rendered head color
  (``adnerf_torso.py:9-73``). Used for both deepspeech and lm3d torso tasks
  (``tasks/nerfs/lm3d_nerf_torso.py:20``).

Positional encodings use ``ops.freq_encode`` (NeRF log bands, include-input —
the ``FreqEmbedder`` of ``modules/nerfs/commons/embedders.py:5-45``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from geneface_tpu.models.nerf.backbone import NeRFBackbone
from geneface_tpu.models.radnerf.cond_encoder import AudioAttNet, AudioNet
from geneface_tpu.ops import freq_encode

__all__ = ["ADNeRF", "Lm3dNeRF", "ADNeRFTorso"]

POS_MULTIRES = 10
VIEW_MULTIRES = 4


class _CoarseFineNeRF(nn.Module):
    """Shared structure: freq embedders + coarse & fine backbones."""

    cond_dim: int = 64
    hidden_size: int = 256

    def setup(self):
        self.model_coarse = NeRFBackbone(hid_dim=self.hidden_size)
        self.model_fine = NeRFBackbone(hid_dim=self.hidden_size)
        self._setup_cond()

    def _setup_cond(self):
        raise NotImplementedError

    def __call__(self, pos, cond_feat, view, run_model_fine=True):
        """pos [N,S,3], cond_feat [cond] or [N,cond], view [N,3] → raw [N,S,4]."""
        pos_embed = freq_encode(pos, POS_MULTIRES)
        view_embed = freq_encode(view, VIEW_MULTIRES)
        net = self.model_fine if run_model_fine else self.model_coarse
        return net(pos_embed, cond_feat, view_embed)


class ADNeRF(_CoarseFineNeRF):
    """DeepSpeech window condition [B, 16, 29] (``adnerf.py``)."""

    def _setup_cond(self):
        self.aud_net = AudioNet(dim_aud=self.cond_dim, win_size=16)
        self.audatt_net = AudioAttNet(in_out_dim=self.cond_dim, seq_len=8)

    def cal_cond_feat(self, cond, with_att=False):
        feat = self.aud_net(cond)
        if with_att:
            feat = self.audatt_net(feat)
        return feat

    def init_all(self, cond, pos, view):
        feat = self.cal_cond_feat(cond, with_att=True)
        self(pos, feat, view, run_model_fine=True)
        return self(pos, feat, view, run_model_fine=False)


class Lm3dNeRF(_CoarseFineNeRF):
    """Landmark condition: idexp lm3d 68*3 (``lm3d_nerf.py``)."""

    use_window_cond: bool = True
    cond_win_size: int = 1
    smo_win_size: int = 5
    with_att: bool = True

    def _setup_cond(self):
        if self.use_window_cond:
            self.lm_encoder = AudioNet(
                dim_aud=self.cond_dim, win_size=self.cond_win_size
            )
            if self.with_att:
                self.lmatt_encoder = AudioAttNet(
                    in_out_dim=self.cond_dim, seq_len=self.smo_win_size
                )
        else:
            self.lm_mlp_dims = (32, 32, 64, self.cond_dim)
            self.lm_encoder_mlp = [nn.Dense(d) for d in self.lm_mlp_dims]

    def cal_cond_feat(self, cond, with_att=False):
        if self.use_window_cond:
            feat = self.lm_encoder(cond)
            if with_att:
                feat = self.lmatt_encoder(feat)
        else:
            feat = cond
            for i, layer in enumerate(self.lm_encoder_mlp):
                feat = layer(feat)
                if i < len(self.lm_encoder_mlp) - 1:
                    feat = nn.leaky_relu(feat, negative_slope=0.02)
        return feat

    def init_all(self, cond, pos, view):
        feat = self.cal_cond_feat(cond, with_att=self.with_att)
        self(pos, feat, view, run_model_fine=True)
        return self(pos, feat, view, run_model_fine=False)


class ADNeRFTorso(_CoarseFineNeRF):
    """Torso field conditioned on audio + head pose (+ head color)
    (``adnerf_torso.py``)."""

    use_color: bool = False
    pose_multires: int = 6
    cond_win_size: int = 16  # 16 for deepspeech windows, 1 for lm3d cond
    smo_win_size: int = 8

    def _setup_cond(self):
        self.aud_net = AudioNet(dim_aud=self.cond_dim, win_size=self.cond_win_size)
        self.audatt_net = AudioAttNet(in_out_dim=self.cond_dim, seq_len=self.smo_win_size)
        if self.use_color:
            self.color_encoder = [nn.Dense(16), nn.Dense(32), nn.Dense(16)]

    def cal_cond_feat(self, cond, euler, trans, color=None, with_att=False):
        """euler/trans: [3]; color: [N, 3] rendered head pixels."""
        feat = self.aud_net(cond)
        if with_att:
            feat = self.audatt_net(feat)
        if feat.ndim == 1:
            feat = feat[None]
        euler_emb = freq_encode(euler[None], self.pose_multires)
        trans_emb = freq_encode(trans[None], self.pose_multires)
        feat = jnp.concatenate(
            [
                feat,
                jnp.broadcast_to(euler_emb, (feat.shape[0], euler_emb.shape[-1])),
                jnp.broadcast_to(trans_emb, (feat.shape[0], trans_emb.shape[-1])),
            ],
            axis=-1,
        )
        if self.use_color:
            if color is None:
                raise ValueError("use_color=True requires head color input")
            cf = color
            for i, layer in enumerate(self.color_encoder):
                cf = layer(cf)
                if i < len(self.color_encoder) - 1:
                    cf = nn.leaky_relu(cf, negative_slope=0.02)
            feat = jnp.broadcast_to(
                feat.reshape(1, -1), (cf.shape[0], feat.shape[-1])
            )
            feat = jnp.concatenate([feat, cf], axis=-1)
        return feat

    def init_all(self, cond, pos, view):
        color = jnp.zeros((pos.shape[0], 3)) if self.use_color else None
        feat = self.cal_cond_feat(
            cond, jnp.zeros(3), jnp.zeros(3), color=color, with_att=True
        )
        self(pos, feat, view, run_model_fine=True)
        return self(pos, feat, view, run_model_fine=False)
