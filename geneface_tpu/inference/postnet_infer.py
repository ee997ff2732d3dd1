"""Postnet inference: wav → HuBERT/f0 → VAE sample → postnet → lm3d .npy.

Re-design of ``inference/postnet/postnet_infer.py:39-137`` (stage A of the
two-stage inference, SURVEY §3.3): extract audio features, run the frozen
audio2motion VAE in prior-sampling mode, refine with the person-specific
post-net, save the predicted idexp landmark sequence for the NeRF stage.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from geneface_tpu.models.audio2motion import PitchContourVAEModel, VAEModel
from geneface_tpu.models.audio2motion.vae import _downsample2
from geneface_tpu.models.postnet import CNNPostNet, PitchContourCNNPostNet
from geneface_tpu.utils import get_last_checkpoint, load_checkpoint
from geneface_tpu.utils.audio import extract_f0, extract_hubert, load_wav16k
from geneface_tpu.utils.pitch import f0_to_coarse

__all__ = ["PostnetInfer"]


class PostnetInfer:
    def __init__(self, cfg):
        self.cfg = cfg
        # pitch-contour variant dispatch (reference postnet_infer invokes the
        # pitch task class via ``audio2motion_task_cls`` reflection)
        self.pitch = "pitch" in cfg.get("audio2motion_task_cls", "").lower()
        if self.pitch:
            self.vae = PitchContourVAEModel(in_out_dim=204)
            self.postnet = PitchContourCNNPostNet(
                in_out_dim=204, pitch_dim=64,
                norm=cfg.get("postnet_norm", "ln"),
            )
        else:
            self.vae = VAEModel(in_out_dim=204)
            self.postnet = CNNPostNet(
                in_out_dim=204, norm=cfg.get("postnet_norm", "ln")
            )

        vae_ckpt = load_checkpoint(
            get_last_checkpoint(cfg["audio2motion_work_dir"])
        )
        self.vae_params = jax.tree_util.tree_map(
            jnp.asarray, vae_ckpt["state"]["params"]
        )
        # the postnet experiment IS the config's own work_dir when driven via
        # the CLI (`tasks.run --config <postnet yaml> --infer`); an explicit
        # postnet_work_dir overrides (reference inp['postnet_ckpt_steps'] dir)
        pn_dir = cfg.get("postnet_work_dir") or cfg["work_dir"]
        pn_ckpt = load_checkpoint(get_last_checkpoint(pn_dir))
        self.pn_params = jax.tree_util.tree_map(
            jnp.asarray, pn_ckpt["state"]["gen_params"]
        )

    def get_cond_from_input(self, wav_path: str):
        """wav → (hubert [2T,1024], f0 [2T]) padded to ×8 frames
        (``postnet_infer.py:45-86``)."""
        wav = load_wav16k(wav_path)
        hubert = extract_hubert(wav)
        if hubert is None:
            raise RuntimeError(
                "HuBERT checkpoint not available locally; pre-extract features "
                "or provide --hubert_npy"
            )
        f0 = extract_f0(wav)
        T = min(len(hubert), len(f0))
        T = (T // 16) * 16  # motion frames x8 after the 2x downsample
        return hubert[:T], f0[:T]

    def infer(self, wav_path: str | None = None, hubert: np.ndarray | None = None,
              f0: np.ndarray | None = None, out_npy: str | None = None,
              temperature: float = 1.0, seed: int = 0):
        """→ predicted idexp_lm3d [T, 68, 3] (and optionally saves .npy)."""
        if hubert is None:
            hubert, f0 = self.get_cond_from_input(wav_path)
        T2 = len(hubert)
        batch = {
            "hubert": jnp.asarray(hubert)[None],
            "y_mask": jnp.ones((1, T2 // 2)),
        }
        if self.pitch:
            if f0 is None:
                raise ValueError("pitch postnet inference requires f0")
            batch["f0"] = jnp.asarray(f0)[None]
        out = self.vae.apply(
            self.vae_params, batch, jax.random.PRNGKey(seed), train=False,
            temperature=temperature,
        )
        raw = out["pred"]  # [1, T, 204]
        if self.pitch:
            f0d = _downsample2(batch["f0"][..., None])[..., 0]
            pitch = self.vae.apply(
                self.vae_params, f0_to_coarse(f0d),
                method=lambda m, c: m.pitch_embed(c),
            )
            refined = self.postnet.apply(self.pn_params, raw, pitch)
        else:
            refined = self.postnet.apply(self.pn_params, raw)
        lm3d = np.asarray(refined[0]).reshape(-1, 68, 3)
        if out_npy:
            os.makedirs(os.path.dirname(os.path.abspath(out_npy)), exist_ok=True)
            np.save(out_npy, lm3d[None])  # [1, T, 68, 3] as the reference
        return lm3d
