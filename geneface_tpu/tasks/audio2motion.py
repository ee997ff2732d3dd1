"""Audio2Motion VAE training with sync supervision.

Re-design of ``tasks/audio2motion/lm3d_vae_sync.py`` (VAESyncAudio2MotionTask):
the HuBERT-conditioned landmark VAE trained with MSE + continuity (first-diff
MSE, ×3) + KL (λ ``lambda_kl``) + a sync loss from a **frozen** pre-trained
SyncNet, gated on until validation sync ≤ 0.75 (``:111-134``). The pitch
variant swaps in ``PitchContourVAEModel``.

TPU adaptation: sync clips are mined host-side (indices only) and gathered
from the *predicted* landmarks inside the jitted step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from geneface_tpu.data.lrs3_dataset import LRS3SeqDataset
from geneface_tpu.models.audio2motion import PitchContourVAEModel, VAEModel
from geneface_tpu.models.syncnet import LandmarkHubertSyncNet, sync_loss
from geneface_tpu.tasks.syncnet import gather_clips, mine_sync_clips
from geneface_tpu.training.optim import finalize_optimizer
from geneface_tpu.training.schedules import build_schedule
from geneface_tpu.training.trainer import Task
from geneface_tpu.utils import get_last_checkpoint, load_checkpoint

__all__ = ["VAESyncAudio2MotionTask", "PitchContourVAESyncTask"]


class VAESyncAudio2MotionTask(Task):
    model_cls = VAEModel

    def make_model(self):
        return self.model_cls(
            in_out_dim=204,
            sqz_prior=self.cfg.get("sqz_prior", False),
            use_prior_flow=self.cfg.get("use_prior_flow", True),
        )

    def build(self):
        cfg = self.cfg
        self.model = self.make_model()
        data_dir = cfg.get("data_dir") or cfg.get("binary_data_dir", "data/binary/lrs3")
        self.train_ds = LRS3SeqDataset(
            "train", data_dir, max_tokens=cfg.get("max_tokens", 20000)
        )
        self.val_ds = LRS3SeqDataset(
            "val", data_dir, max_tokens=cfg.get("max_tokens", 20000)
        )
        self.np_rng = np.random.RandomState(cfg.get("seed", 9999))
        self.clip_batch = cfg.get("syncnet_num_samples_per_batch", 256)
        self.enable_sync = False

        T = 32
        dummy = {
            "hubert": jnp.zeros((1, 2 * T, 1024)),
            "y": jnp.zeros((1, T, 204)),
            "y_mask": jnp.ones((1, T)),
            "f0": jnp.zeros((1, 2 * T)),
        }
        params = self.model.init(
            jax.random.PRNGKey(cfg.get("seed", 9999)), dummy, jax.random.PRNGKey(0)
        )

        # frozen syncnet from its experiment dir (lm3d_vae_sync.py:27-40)
        self.syncnet = LandmarkHubertSyncNet(
            lm_dim=60, norm=self.cfg.get("syncnet_norm", "ln")
        )
        sync_dir = cfg.get("syncnet_work_dir", "")
        if sync_dir:
            ckpt = load_checkpoint(get_last_checkpoint(sync_dir) or sync_dir)
            self.sync_params = jax.tree_util.tree_map(
                jnp.asarray, ckpt["state"]["params"]
            )
        else:
            self.sync_params = self.syncnet.init(
                jax.random.PRNGKey(1), jnp.zeros((1, 10, 1024)), jnp.zeros((1, 5, 60))
            )

        schedule = build_schedule(cfg)
        self.tx = finalize_optimizer(
            optax.adam(schedule, b1=cfg.get("optimizer_adam_beta1", 0.9),
                       b2=cfg.get("optimizer_adam_beta2", 0.999)),
            cfg,
        )
        opt_state = self.tx.init(params)
        self._build_jits()
        return {"params": params, "opt_state": opt_state}

    # ------------------------------------------------------------------------
    def _losses(self, params, batch, clip_idx, rng, sync_weight):
        cfg = self.cfg
        out = self.model.apply(params, batch, rng, train=True)
        pred = out["pred"]  # [B, T, 204]
        mask = batch["y_mask"][..., None]
        gt = batch["y"]
        denom = jnp.maximum(jnp.sum(mask), 1.0) * 204

        mse = jnp.sum(((pred - gt) * mask) ** 2) / denom
        diff_pred = (pred[:, 1:] - pred[:, :-1]) * mask[:, 1:]
        diff_gt = (gt[:, 1:] - gt[:, :-1]) * mask[:, 1:]
        continuity = jnp.sum((diff_pred - diff_gt) ** 2) / denom

        # sync loss on predicted mouth landmarks, frozen syncnet
        lm = pred.reshape(pred.shape[0], pred.shape[1], 68, 3)
        mouth = lm[:, :, 48:68].reshape(pred.shape[0], pred.shape[1], 60)
        ii, ms, mi, mel_s = clip_idx
        mouth_clips, mel_clips = gather_clips(
            mouth, batch["hubert"], ii, ms, mi, mel_s
        )
        a, m = self.syncnet.apply(self.sync_params, mel_clips, mouth_clips)
        sync, _ = sync_loss(a, m, jnp.ones(a.shape[0]))

        losses = {"mse": mse, "continuity": continuity, "kl": out["loss_kl"],
                  "sync": sync}
        total = (
            mse
            + 3.0 * continuity
            + cfg.get("lambda_kl", 0.5) * out["loss_kl"]
            + sync_weight * sync
        )
        losses["total_loss"] = total
        return total, losses

    def _build_jits(self):
        tx = self.tx

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch, clip_idx, rng, sync_weight):
            (_, losses), grads = jax.value_and_grad(
                lambda p: self._losses(p, batch, clip_idx, rng, sync_weight),
                has_aux=True,
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, losses

        @jax.jit
        def val_step(params, batch, clip_idx, rng):
            _, losses = self._losses(params, batch, clip_idx, rng, 0.0)
            return losses

        self._train_step_fn = train_step
        self._val_step_fn = val_step

    def _prep(self, batch):
        dev = {
            k: jnp.asarray(v)
            for k, v in batch.items()
            if k in ("hubert", "y", "y_mask", "f0", "mel")
        }
        y_lens = batch["y_mask"].sum(-1).astype(int)
        ii, ms, mi, mel_s, _ = mine_sync_clips(
            y_lens, self.clip_batch, self.np_rng, infer=True
        )
        clip_idx = tuple(jnp.asarray(a) for a in (ii, ms, mi, mel_s))
        return dev, clip_idx

    def train_step(self, state, batch, rng):
        dev, clip_idx = self._prep(batch)
        sync_w = (
            self.cfg.get("lambda_sync", 0.01) if self.enable_sync else 0.0
        )
        params, opt_state, losses = self._train_step_fn(
            state["params"], state["opt_state"], dev, clip_idx, rng,
            jnp.float32(sync_w),
        )
        return {"params": params, "opt_state": opt_state}, losses

    def val_step(self, state, batch, rng):
        dev, clip_idx = self._prep(batch)
        losses = self._val_step_fn(state["params"], dev, clip_idx, rng)
        # sync gating (lm3d_vae_sync.py:131-134)
        if float(losses["sync"]) <= 0.75 and not self.enable_sync:
            self.enable_sync = True
        return losses

    def train_batches(self, start_step):
        return self.train_ds.iter_batches(seed=self.cfg.get("seed", 0))

    def val_batches(self):
        return self.val_ds.iter_batches(shuffle=False, infinite=False)

    def on_save(self, state):
        return {"enable_sync": self.enable_sync}

    def on_restore(self, state, extra):
        self.enable_sync = bool(extra.get("enable_sync", False))
        return state


    @classmethod
    def run_inference(cls, cfg):
        """wav -> raw VAE motion .npy (reference
        ``inference/audio2motion/audio2motion_infer.example_run``)."""
        from geneface_tpu.inference.audio2motion_infer import Audio2MotionInfer

        infer = Audio2MotionInfer(cfg)
        return infer.infer(
            wav_path=cfg.get("infer_audio_source_name"),
            out_npy=cfg.get("infer_out_npy_name", "infer_out/pred_lm3d.npy"),
            temperature=cfg.get("infer_temperature", 1.0),
            seed=cfg.get("seed", 0),
        )


class PitchContourVAESyncTask(VAESyncAudio2MotionTask):
    model_cls = PitchContourVAEModel
