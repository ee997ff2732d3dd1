"""Audio2Motion inference: wav → HuBERT → VAE prior sample → lm3d .npy.

Re-design of ``inference/audio2motion/audio2motion_infer.py:13-137``: the
single-model driver that runs the generic (LRS3-trained) VAE without the
person-specific post-net — used to inspect the raw motion prior.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from geneface_tpu.models.audio2motion import VAEModel
from geneface_tpu.utils import get_last_checkpoint, load_checkpoint
from geneface_tpu.utils.audio import extract_hubert, load_wav16k

__all__ = ["Audio2MotionInfer"]


class Audio2MotionInfer:
    def __init__(self, cfg):
        self.cfg = cfg
        self.model = VAEModel(in_out_dim=cfg.get("motion_dim", 204))
        ckpt = load_checkpoint(
            get_last_checkpoint(cfg["audio2motion_work_dir"])
        )
        self.params = jax.tree_util.tree_map(
            jnp.asarray, ckpt["state"]["params"]
        )

    def get_cond_from_input(self, wav_path: str) -> np.ndarray:
        """wav → HuBERT [2T, 1024] padded to a multiple of 16 audio frames
        (``audio2motion_infer.py:44-80``)."""
        wav = load_wav16k(wav_path)
        hubert = extract_hubert(wav)
        if hubert is None:
            raise RuntimeError(
                "HuBERT checkpoint not available locally; pre-extract features"
            )
        T = (len(hubert) // 16) * 16
        return hubert[:T]

    def infer(
        self,
        wav_path: str | None = None,
        hubert: np.ndarray | None = None,
        out_npy: str | None = None,
        temperature: float = 1.0,
        seed: int = 0,
    ) -> np.ndarray:
        """→ predicted idexp_lm3d [T, 68, 3]; optionally saved as .npy with
        the reference's [1, T, 204] layout."""
        if hubert is None:
            hubert = self.get_cond_from_input(wav_path)
        T2 = len(hubert)
        batch = {
            "hubert": jnp.asarray(hubert)[None],
            "y_mask": jnp.ones((1, T2 // 2)),
        }
        out = self.model.apply(
            self.params, batch, jax.random.PRNGKey(seed), train=False,
            temperature=temperature,
        )
        pred = np.asarray(out["pred"][0])  # [T, 204]
        if out_npy:
            os.makedirs(os.path.dirname(os.path.abspath(out_npy)), exist_ok=True)
            np.save(out_npy, pred[None])
        return pred.reshape(-1, 68, 3)
