"""Audio2Pose training task (teacher-forced WaveNet + GMM loss).

Re-design of ``tasks/audio2pose/audio2pose.py``: train the conditioned
WaveNet on (audio window, shifted pose+velocity history) → GMM params of the
next-step pose+velocity, with ``GMMLogLoss`` (ncenter=1, ndim=12); inference
is the autoregressive rollout in
``geneface_tpu.models.audio2pose.autoregressive_infer``.

Expects a binarized sequence store with per-clip ``audio`` [T, C] features and
``pose`` [T, 6] (euler+trans); velocity is the first difference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from geneface_tpu.models.audio2pose import Audio2PoseModel, gmm_log_loss
from geneface_tpu.training.optim import finalize_optimizer
from geneface_tpu.training.schedules import build_schedule
from geneface_tpu.training.trainer import Task
from geneface_tpu.utils.indexed_dataset import IndexedDataset

__all__ = ["Audio2PoseTask", "pose_to_pose_velocity"]


def pose_to_pose_velocity(pose: np.ndarray) -> np.ndarray:
    """[T, 6] pose → [T, 12] (pose, velocity); velocity[0] = 0."""
    vel = np.zeros_like(pose)
    vel[1:] = pose[1:] - pose[:-1]
    return np.concatenate([pose, vel], -1)


class _PoseSeqDataset:
    def __init__(self, prefix, data_dir, seq_len=100, audio_dim=58, rng=None):
        import os

        self.ds = IndexedDataset(os.path.join(data_dir, prefix))
        self.seq_len = seq_len
        self.audio_dim = audio_dim
        self.rng = rng or np.random.RandomState(0)

    def __len__(self):
        return len(self.ds)

    def batch(self, batch_size):
        """Random fixed-length crops → audio [B, L, C], pv [B, L, 12]."""
        auds, pvs = [], []
        while len(auds) < batch_size:
            item = self.ds[self.rng.randint(len(self.ds))]
            audio = np.asarray(item["audio"], np.float32)
            pose = np.asarray(item["pose"], np.float32)
            T = min(len(audio), len(pose))
            if T < self.seq_len + 1:
                continue
            s = self.rng.randint(0, T - self.seq_len)
            auds.append(audio[s : s + self.seq_len])
            pvs.append(pose_to_pose_velocity(pose[s : s + self.seq_len + 1]))
        return {
            "audio": np.stack(auds),
            "pose_velocity": np.stack(pvs),  # [B, L+1, 12]
        }


class Audio2PoseTask(Task):
    def build(self):
        cfg = self.cfg
        self.model = Audio2PoseModel(
            recept_field=cfg.get("recept_field", 100),
            audio_in_dim=cfg.get("audio_in_dim", 58),
        )
        data_dir = cfg.get("data_dir") or cfg.get("binary_data_dir", "data/binary/pose")
        L = cfg.get("seq_len", 100)
        self.train_ds = _PoseSeqDataset(
            "train", data_dir, L, cfg.get("audio_in_dim", 58),
            np.random.RandomState(cfg.get("seed", 0)),
        )
        self.val_ds = _PoseSeqDataset(
            "val", data_dir, L, cfg.get("audio_in_dim", 58),
            np.random.RandomState(cfg.get("seed", 0) + 1),
        )
        self.batch_size = cfg.get("batch_size", 8)

        params = self.model.init(
            jax.random.PRNGKey(cfg.get("seed", 9999)),
            jnp.zeros((1, L, cfg.get("audio_in_dim", 58))),
            jnp.zeros((1, L, 12)),
        )
        self.tx = finalize_optimizer(optax.adam(build_schedule(cfg)), cfg)
        opt_state = self.tx.init(params)
        self._build_jits()
        return {"params": params, "opt_state": opt_state}

    def _build_jits(self):
        tx = self.tx

        def loss_fn(params, batch):
            audio = batch["audio"]
            pv = batch["pose_velocity"]
            # teacher forcing: history = pv[:-1], target = pv[1:] (the causal
            # WaveNet predicts the next step at each position)
            out = self.model.apply(params, audio, pv[:, :-1])
            loss = gmm_log_loss(out, pv[:, 1:])
            return loss, {"gmm_loss": loss, "total_loss": loss}

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch):
            (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, losses

        self._train_step_fn = train_step
        self._val_step_fn = jax.jit(lambda p, b: loss_fn(p, b)[1])

    def train_step(self, state, batch, rng):
        dev = {k: jnp.asarray(v) for k, v in batch.items()}
        params, opt_state, losses = self._train_step_fn(
            state["params"], state["opt_state"], dev
        )
        return {"params": params, "opt_state": opt_state}, losses

    def val_step(self, state, batch, rng):
        dev = {k: jnp.asarray(v) for k, v in batch.items()}
        return self._val_step_fn(state["params"], dev)

    def train_batches(self, start_step):
        while True:
            yield self.train_ds.batch(self.batch_size)

    def val_batches(self):
        for _ in range(4):
            yield self.val_ds.batch(self.batch_size)


    @classmethod
    def run_inference(cls, cfg):
        """deepspeech .npy -> predicted c2w poses .npy (reference
        ``inference/audio2pose/audio2pose_infer.example_run``)."""
        from geneface_tpu.inference.audio2pose_infer import Audio2PoseInfer

        infer = Audio2PoseInfer(cfg)
        return infer.infer(
            deepspeech_npy=cfg.get("infer_audio_source_name"),
            out_npy=cfg.get("infer_out_npy_name", "infer_out/pred_pose.npy"),
            seed=cfg.get("seed", 0),
        )
