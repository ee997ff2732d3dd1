"""SyncNet training task (LRS3 audio/mouth-landmark synchrony).

Re-design of ``tasks/syncnet/lm3d_syncnet.py``: positive/negative clip mining
(pos 50%; negatives: wrong-speaker 25%, wrong-offset-in-clip 37.5%, shifted
±[2,5] frames 37.5%, ``:74-103``), cosine-BCE loss.

TPU adaptation: mining happens host-side in numpy (it's index bookkeeping),
producing fixed-shape clip tensors [K, 5, 60] / [K, 10, 1024] for one jitted
step — the reference's python loop over torch tensors becomes batch gathers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from geneface_tpu.data.lrs3_dataset import LRS3SeqDataset
from geneface_tpu.models.syncnet import LandmarkHubertSyncNet, sync_loss
from geneface_tpu.training.optim import finalize_optimizer
from geneface_tpu.training.schedules import build_schedule
from geneface_tpu.training.trainer import Task

__all__ = ["SyncNetTask", "mine_sync_clips"]


def mine_sync_clips(
    y_lens: np.ndarray,  # [B] valid motion lengths
    batch_size: int,
    rng: np.random.RandomState,
    infer: bool = False,
):
    """→ (item_idx [K], mouth_start [K], mel_start [K], labels [K]).

    Mirrors the mining distribution of ``lm3d_syncnet.py:74-103``. Only
    indices are produced; gathering happens wherever the tensors live.
    """
    B = len(y_lens)
    item_idx, mouth_start, mel_start, labels = [], [], [], []
    while len(item_idx) < batch_size:
        for i in range(B):
            hi = int(y_lens[i]) - 6
            if hi < 1:
                continue
            exp_idx = rng.randint(0, hi + 1)
            pos = True if infer else bool(rng.randint(0, 2))
            if pos:
                src_i, mel_idx, label = i, exp_idx, 1.0
            else:
                r = rng.rand()
                if r < 0.25 and B > 1:
                    src_i = rng.randint(0, B)
                    hj = int(y_lens[src_i]) - 6
                    mel_idx = rng.randint(0, max(hj, 0) + 1)
                elif r < 0.625:
                    src_i = i
                    mel_idx = exp_idx
                    for _ in range(10):
                        mel_idx = rng.randint(0, hi + 1)
                        if mel_idx != exp_idx:
                            break
                else:
                    src_i = i
                    lo_off = max(-5, -exp_idx)
                    hi_off = min(5, hi - exp_idx)
                    off = 0
                    for _ in range(10):
                        off = rng.randint(lo_off, hi_off + 1)
                        if abs(off) > 1:
                            break
                    mel_idx = exp_idx + off
                label = 0.0
            item_idx.append(i)
            mouth_start.append(exp_idx)
            mel_start.append((src_i, mel_idx))
            labels.append(label)
            if len(item_idx) >= batch_size:
                break
    mel_item = np.array([m[0] for m in mel_start])
    mel_s = np.array([m[1] for m in mel_start])
    return (
        np.array(item_idx),
        np.array(mouth_start),
        mel_item,
        mel_s,
        np.array(labels, np.float32),
    )


def gather_clips(mouth, hubert, item_idx, mouth_start, mel_item, mel_start):
    """Gather [K,5,·] mouth and [K,10,·] hubert clips (jnp or numpy arrays)."""
    offs5 = jnp.arange(5)
    offs10 = jnp.arange(10)
    mouth_clips = mouth[item_idx[:, None], mouth_start[:, None] + offs5[None]]
    mel_clips = hubert[mel_item[:, None], 2 * mel_start[:, None] + offs10[None]]
    return mouth_clips, mel_clips


class SyncNetTask(Task):
    def build(self):
        cfg = self.cfg
        self.model = LandmarkHubertSyncNet(
            lm_dim=cfg.get("syncnet_lm_dim", 60),
            norm=cfg.get("syncnet_norm", "ln"),
        )
        data_dir = cfg.get("data_dir") or cfg.get("binary_data_dir", "data/binary/lrs3")
        self.train_ds = LRS3SeqDataset(
            "train", data_dir, max_tokens=cfg.get("max_tokens", 60000)
        )
        self.val_ds = LRS3SeqDataset(
            "val", data_dir, max_tokens=cfg.get("max_tokens", 60000)
        )
        self.clip_batch = cfg.get("syncnet_num_samples_per_batch", 1024)
        self.np_rng = np.random.RandomState(cfg.get("seed", 9999))

        params = self.model.init(
            jax.random.PRNGKey(cfg.get("seed", 9999)),
            jnp.zeros((2, 10, 1024)),
            jnp.zeros((2, 5, cfg.get("syncnet_lm_dim", 60))),
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

    def _build_jits(self):
        tx = self.tx
        model = self.model

        def loss_fn(params, clips):
            a, m = model.apply(params, clips["mel"], clips["mouth"])
            loss, d = sync_loss(a, m, clips["labels"])
            return loss, {"sync_loss": loss, "cosine_sim": jnp.mean(d)}

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, clips):
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, clips
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics["total_loss"] = metrics["sync_loss"]
            return params, opt_state, metrics

        @jax.jit
        def val_step(params, clips):
            _, metrics = loss_fn(params, clips)
            metrics["total_loss"] = metrics["sync_loss"]
            return metrics

        self._train_step_fn = train_step
        self._val_step_fn = val_step

    def _mine(self, batch, infer=False):
        y_lens = batch["y_mask"].sum(-1).astype(int)
        ii, ms, mi, mel_s, labels = mine_sync_clips(
            y_lens, self.clip_batch, self.np_rng, infer=infer
        )
        mouth_clips, mel_clips = gather_clips(
            jnp.asarray(batch["mouth_lm3d"]), jnp.asarray(batch["hubert"]),
            jnp.asarray(ii), jnp.asarray(ms), jnp.asarray(mi), jnp.asarray(mel_s),
        )
        return {
            "mouth": mouth_clips,
            "mel": mel_clips,
            "labels": jnp.asarray(labels),
        }

    def train_step(self, state, batch, rng):
        params, opt_state, metrics = self._train_step_fn(
            state["params"], state["opt_state"], self._mine(batch)
        )
        return {"params": params, "opt_state": opt_state}, metrics

    def val_step(self, state, batch, rng):
        return self._val_step_fn(state["params"], self._mine(batch, infer=False))

    def train_batches(self, start_step):
        return self.train_ds.iter_batches(seed=self.cfg.get("seed", 0))

    def val_batches(self):
        return self.val_ds.iter_batches(shuffle=False, infinite=False)
