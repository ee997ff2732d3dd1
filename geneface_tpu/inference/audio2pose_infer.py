"""Audio2Pose inference: audio features → autoregressive pose → c2w .npy.

Re-design of ``inference/audio2pose/audio2pose_infer.py:16-152``: loads the
trained WaveNet-GMM pose model, rolls the autoregressive sampler over the
audio track, converts (euler, trans) to camera-to-world matrices and saves
them for the torso/head NeRF stage.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from geneface_tpu.models.audio2pose import Audio2PoseModel, autoregressive_infer
from geneface_tpu.utils import get_last_checkpoint, load_checkpoint
from geneface_tpu.utils.camera import euler_trans_to_c2w

__all__ = ["Audio2PoseInfer"]


class Audio2PoseInfer:
    def __init__(self, cfg):
        self.cfg = cfg
        self.model = Audio2PoseModel(
            recept_field=cfg.get("recept_field", 100),
            audio_in_dim=cfg.get("audio_in_dim", 58),
        )
        ckpt = load_checkpoint(get_last_checkpoint(cfg["audio2pose_work_dir"]))
        self.params = jax.tree_util.tree_map(
            jnp.asarray, ckpt["state"]["params"]
        )
        # dataset statistics used to de-normalize the translation and seed
        # the history window (``audio2pose_infer.py:26-28``)
        stats_path = os.path.join(cfg.get("pose_data_dir", ""), "stats.npz")
        if os.path.exists(stats_path):
            stats = np.load(stats_path)
            self.mean_trans = stats["mean_trans"]
            self.init_pose = stats["init_pose"]
        else:
            self.mean_trans = np.zeros(3, np.float32)
            self.init_pose = np.zeros(6, np.float32)

    def get_cond_from_input(self, deepspeech_npy: str) -> np.ndarray:
        """Pre-extracted deepspeech [T, 16, 29] → center-window features
        [T, 58] (``audio2pose_infer.py:74-91`` uses columns 7:9)."""
        arr = np.load(deepspeech_npy)
        return arr[:, 7:9, :].reshape(len(arr), -1).astype(np.float32)

    def infer(
        self,
        deepspeech_npy: str | None = None,
        audio_feat: np.ndarray | None = None,
        out_npy: str | None = None,
        seed: int = 0,
    ) -> np.ndarray:
        """→ predicted c2w matrices [T, 4, 4]; optionally saved as .npy."""
        if audio_feat is None:
            audio_feat = self.get_cond_from_input(deepspeech_npy)
        pose6 = autoregressive_infer(
            self.model,
            self.params,
            jnp.asarray(audio_feat),
            jax.random.PRNGKey(seed),
            init_pose=self.init_pose,
        )
        pose6 = np.asarray(pose6)
        euler, trans = pose6[:, :3], pose6[:, 3:6] + self.mean_trans[None]
        c2w = euler_trans_to_c2w(euler, trans)
        if out_npy:
            os.makedirs(os.path.dirname(os.path.abspath(out_npy)), exist_ok=True)
            np.save(out_npy, c2w)
        return c2w
