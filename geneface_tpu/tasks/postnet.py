"""Post-net adversarial domain adaptation task.

Re-design of ``tasks/postnet/lm3d_postnet_adv_sync.py`` (PostnetAdvSyncTask):
the person-specific CNN post-net refines landmarks sampled from the *frozen*
LRS3 audio2motion VAE; losses: person-domain MSE (λ ``postnet_lambda_mse``),
LSGAN adversarial vs the frame-wise MLP discriminator on the target person's
landmark distribution (λ ``postnet_lambda_adv``), and frozen-SyncNet sync
(λ ``postnet_lambda_sync``) (``:100-196``). Two optimizers (RMSprop);
the discriminator trains every ``postnet_disc_interval`` steps.

Pitch variant (``tasks/postnet/lm3d_postnet_adv_sync_pitch.py``): when the
config's ``audio2motion_task_cls`` names the pitch-contour VAE task, the
frozen upstream is :class:`PitchContourVAEModel`, the generator is
:class:`PitchContourCNNPostNet` conditioned on the frozen VAE's own pitch
embedding of the 2x-downsampled f0 (``:127-128``), and two extra generator
losses apply: ``reg`` — refined-vs-raw L2 on the LRS3 batch (``:168``,
λ ``postnet_lambda_reg``) — and ``continuity`` — first-difference + initial
frame L2 on the person batch (``:219-227``, λ ``postnet_lambda_continuity``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from geneface_tpu.data.lrs3_dataset import LRS3SeqDataset
from geneface_tpu.models.audio2motion import PitchContourVAEModel, VAEModel
from geneface_tpu.models.audio2motion.vae import _downsample2
from geneface_tpu.models.postnet import (
    CNNPostNet,
    MLPDiscriminator,
    PitchContourCNNPostNet,
)
from geneface_tpu.utils.pitch import f0_to_coarse
from geneface_tpu.models.syncnet import LandmarkHubertSyncNet, sync_loss
from geneface_tpu.tasks.syncnet import gather_clips, mine_sync_clips
from geneface_tpu.training.optim import finalize_optimizer
from geneface_tpu.training.schedules import build_schedule
from geneface_tpu.training.trainer import Task
from geneface_tpu.utils import get_last_checkpoint, load_checkpoint

__all__ = ["PostnetAdvSyncTask"]


class PostnetAdvSyncTask(Task):
    def build(self):
        cfg = self.cfg
        # pitch variant dispatch (the reference splits this into a separate
        # task class, lm3d_postnet_adv_sync_pitch.py; here one task serves
        # both, keyed — like the reference's configs — off the upstream
        # audio2motion task class name)
        self.pitch = "pitch" in cfg.get("audio2motion_task_cls", "").lower()
        if self.pitch:
            self.model = PitchContourCNNPostNet(
                in_out_dim=204, pitch_dim=64,
                norm=cfg.get("postnet_norm", "ln"),
            )
        else:
            self.model = CNNPostNet(
                in_out_dim=204, norm=self.cfg.get("postnet_norm", "ln")
            )
        self.disc = MLPDiscriminator(in_dim=204)

        lrs3_dir = cfg.get("lrs3_data_dir") or cfg.get(
            "binary_data_dir", "data/binary/lrs3"
        )
        person_dir = cfg.get("person_data_dir", lrs3_dir)
        self.train_ds = LRS3SeqDataset(
            "train", lrs3_dir, max_tokens=cfg.get("max_tokens", 20000)
        )
        self.val_ds = LRS3SeqDataset(
            "val", lrs3_dir, max_tokens=cfg.get("max_tokens", 20000)
        )
        self.person_ds = LRS3SeqDataset(
            "train", person_dir, max_tokens=cfg.get("max_tokens", 20000)
        )
        self._person_iter = self.person_ds.iter_batches(
            seed=cfg.get("seed", 0) + 1
        )
        self.np_rng = np.random.RandomState(cfg.get("seed", 9999))
        self.clip_batch = cfg.get("syncnet_num_samples_per_batch", 256)

        # frozen upstream models (loaded by reflection in the reference,
        # lm3d_postnet_adv_sync.py:28-50)
        vae_cls = PitchContourVAEModel if self.pitch else VAEModel
        self.vae = vae_cls(in_out_dim=204)
        vae_dir = cfg.get("audio2motion_work_dir", "")
        T = 32
        dummy = {
            "hubert": jnp.zeros((1, 2 * T, 1024)),
            "y": jnp.zeros((1, T, 204)),
            "y_mask": jnp.ones((1, T)),
        }
        if self.pitch:
            dummy["f0"] = jnp.zeros((1, 2 * T))
        if vae_dir:
            ckpt = load_checkpoint(get_last_checkpoint(vae_dir) or vae_dir)
            self.vae_params = jax.tree_util.tree_map(
                jnp.asarray, ckpt["state"]["params"]
            )
        else:
            self.vae_params = self.vae.init(
                jax.random.PRNGKey(0), dummy, jax.random.PRNGKey(1)
            )
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
                jax.random.PRNGKey(2), jnp.zeros((1, 10, 1024)),
                jnp.zeros((1, 5, 60)),
            )

        if self.pitch:
            gen_params = self.model.init(
                jax.random.PRNGKey(3), jnp.zeros((1, 8, 204)),
                jnp.zeros((1, 8, 64)),
            )
        else:
            gen_params = self.model.init(
                jax.random.PRNGKey(3), jnp.zeros((1, 8, 204))
            )
        disc_params = self.disc.init(jax.random.PRNGKey(4), jnp.zeros((1, 8, 204)))

        schedule = build_schedule(cfg)
        self.gen_tx = finalize_optimizer(optax.rmsprop(schedule), cfg)
        self.disc_tx = finalize_optimizer(
            optax.rmsprop(
                lambda s: schedule(s) * cfg.get("postnet_disc_lr_ratio", 1.0)
            ),
            cfg,
        )
        self._step = 0
        self._build_jits()
        return {
            "gen_params": gen_params,
            "disc_params": disc_params,
            "gen_opt": self.gen_tx.init(gen_params),
            "disc_opt": self.disc_tx.init(disc_params),
        }

    # ----------------------------------------------------------------------
    def _vae_sample(self, batch, rng):
        out = self.vae.apply(self.vae_params, batch, rng, train=False)
        return jax.lax.stop_gradient(out["pred"])

    def _pitch_feat(self, batch):
        """Frozen pitch embedding of the 2x-downsampled f0 — the reference
        reuses the audio2motion model's own ``downsampler`` + ``pitch_embed``
        (``lm3d_postnet_adv_sync_pitch.py:40-41,127-128``)."""
        f0d = _downsample2(batch["f0"][..., None])[..., 0]
        pitch = self.vae.apply(
            self.vae_params, f0_to_coarse(f0d),
            method=lambda m, c: m.pitch_embed(c),
        )
        return jax.lax.stop_gradient(pitch)

    def _refine(self, gen_params, raw, batch):
        if self.pitch:
            return self.model.apply(
                gen_params, raw, self._pitch_feat(batch)
            )
        return self.model.apply(gen_params, raw)

    def _build_jits(self):
        cfg = self.cfg
        gen_tx, disc_tx = self.gen_tx, self.disc_tx

        def gen_loss(gen_params, disc_params, lrs3, person, clip_idx, rng, adv_on):
            k1, k2 = jax.random.split(rng)
            raw_lrs3 = self._vae_sample(lrs3, k1)
            raw_person = self._vae_sample(person, k2)

            refine_person = self._refine(gen_params, raw_person, person)
            refine_person = refine_person * person["y_mask"][..., None]
            denom = jnp.maximum(person["y_mask"].sum(), 1.0) * 204
            mse = jnp.sum((person["y"] - refine_person) ** 2) / denom

            # continuity: first-difference + initial-frame L2 vs GT on the
            # person batch (lm3d_postnet_adv_sync_pitch.py:219-227)
            d_pred = refine_person[:, 1:] - refine_person[:, :-1]
            d_gt = person["y"][:, 1:] - person["y"][:, :-1]
            cont_err = (d_pred - d_gt) * person["y_mask"][:, 1:, None]
            init_err = refine_person[:, 0, :] - person["y"][:, 0, :]
            continuity = (
                jnp.sum(cont_err**2) + jnp.sum(init_err**2)
            ) / denom

            refine_lrs3 = self._refine(gen_params, raw_lrs3, lrs3)

            # reg: keep the refinement close to the raw VAE sample on the
            # LRS3 batch (lm3d_postnet_adv_sync_pitch.py:168)
            reg = jnp.sum(
                ((refine_lrs3 - raw_lrs3) * lrs3["y_mask"][..., None]) ** 2
            ) / jnp.maximum(lrs3["y_mask"].sum(), 1.0)
            lm = refine_lrs3.reshape(*refine_lrs3.shape[:2], 68, 3)
            mouth = lm[:, :, 48:68].reshape(*refine_lrs3.shape[:2], 60)
            ii, ms, mi, mel_s = clip_idx
            mouth_clips, mel_clips = gather_clips(
                mouth, lrs3["hubert"], ii, ms, mi, mel_s
            )
            a, m = self.syncnet.apply(self.sync_params, mel_clips, mouth_clips)
            sync, _ = sync_loss(a, m, jnp.ones(a.shape[0]))

            v, fmask = self.disc.apply(disc_params, refine_lrs3)
            adv = jnp.sum(((1.0 - v[..., 0]) ** 2) * fmask) / jnp.maximum(
                fmask.sum(), 1.0
            )
            total = (
                cfg.get("postnet_lambda_mse", 0.05) * mse
                + cfg.get("postnet_lambda_reg", 0.0) * reg
                + cfg.get("postnet_lambda_continuity", 0.0) * continuity
                + adv_on * cfg.get("postnet_lambda_adv", 0.85) * adv
                + adv_on * cfg.get("postnet_lambda_sync", 0.1) * sync
            )
            losses = {
                "mse": mse, "adv": adv, "sync": sync, "reg": reg,
                "continuity": continuity, "total_loss": total,
            }
            return total, (losses, jax.lax.stop_gradient(refine_lrs3))

        @partial(jax.jit, donate_argnums=(0, 2))
        def gen_step(gen_params, disc_params, gen_opt, lrs3, person, clip_idx,
                     rng, adv_on):
            (_, (losses, pred)), grads = jax.value_and_grad(
                gen_loss, has_aux=True
            )(gen_params, disc_params, lrs3, person, clip_idx, rng, adv_on)
            updates, gen_opt = gen_tx.update(grads, gen_opt, gen_params)
            gen_params = optax.apply_updates(gen_params, updates)
            return gen_params, gen_opt, losses, pred

        def disc_loss(disc_params, fake, real, real_mask):
            v_fake, m_fake = self.disc.apply(disc_params, fake)
            v_real, m_real = self.disc.apply(disc_params, real)
            m_fake = m_fake.astype(jnp.float32)
            m_real = m_real.astype(jnp.float32) * real_mask
            fake_loss = jnp.sum((v_fake[..., 0] ** 2) * m_fake) / jnp.maximum(
                m_fake.sum(), 1.0
            )
            true_loss = jnp.sum(((v_real[..., 0] - 1.0) ** 2) * m_real) / jnp.maximum(
                m_real.sum(), 1.0
            )
            losses = {
                "disc_fake_loss": fake_loss,
                "disc_true_loss": true_loss,
                "disc_neg_conf": jnp.sum(v_fake[..., 0] * m_fake)
                / jnp.maximum(m_fake.sum(), 1.0),
                "disc_pos_conf": jnp.sum(v_real[..., 0] * m_real)
                / jnp.maximum(m_real.sum(), 1.0),
            }
            return fake_loss + true_loss, losses

        @partial(jax.jit, donate_argnums=(1,))
        def disc_step(disc_params, disc_opt, fake, real, real_mask):
            (_, losses), grads = jax.value_and_grad(disc_loss, has_aux=True)(
                disc_params, fake, real, real_mask
            )
            updates, disc_opt = disc_tx.update(grads, disc_opt, disc_params)
            disc_params = optax.apply_updates(disc_params, updates)
            return disc_params, disc_opt, losses

        self._gen_step_fn = gen_step
        self._disc_step_fn = disc_step

    #: sequence-batch axis sharded over the mesh when divisible (GAN task
    #: DP parity; non-divisible token-bucketed batches replicate)
    data_batch_keys = ("hubert", "y", "y_mask", "f0")

    def _dev(self, batch):
        keys = ("hubert", "y", "y_mask") + (("f0",) if self.pitch else ())
        return self.place_batch(
            {k: v for k, v in batch.items() if k in keys}
        )

    def train_step(self, state, batch, rng):
        cfg = self.cfg
        lrs3 = self._dev(batch)
        person = self._dev(next(self._person_iter))
        y_lens = batch["y_mask"].sum(-1).astype(int)
        ii, ms, mi, mel_s, _ = mine_sync_clips(
            y_lens, self.clip_batch, self.np_rng, infer=True
        )
        clip_idx = tuple(jnp.asarray(a) for a in (ii, ms, mi, mel_s))
        adv_on = jnp.float32(
            1.0 if self._step >= cfg.get("postnet_disc_start_steps", 0) else 0.0
        )
        gen_params, gen_opt, losses, pred = self._gen_step_fn(
            state["gen_params"], state["disc_params"], state["gen_opt"],
            lrs3, person, clip_idx, rng, adv_on,
        )
        state = dict(
            state, gen_params=gen_params, gen_opt=gen_opt
        )
        if self._step % cfg.get("postnet_disc_interval", 1) == 0:
            disc_params, disc_opt, disc_losses = self._disc_step_fn(
                state["disc_params"], state["disc_opt"], pred, person["y"],
                person["y_mask"],
            )
            state.update(disc_params=disc_params, disc_opt=disc_opt)
            losses = {**losses, **disc_losses}
        self._step += 1
        return state, losses

    def val_step(self, state, batch, rng):
        lrs3 = self._dev(batch)
        person = self._dev(next(self._person_iter))
        y_lens = batch["y_mask"].sum(-1).astype(int)
        ii, ms, mi, mel_s, _ = mine_sync_clips(
            y_lens, self.clip_batch, self.np_rng, infer=True
        )
        clip_idx = tuple(jnp.asarray(a) for a in (ii, ms, mi, mel_s))
        # reuse gen loss without updates
        k = rng
        raw = self.vae.apply(self.vae_params, person, k, train=False)["pred"]
        refined = self._refine(state["gen_params"], raw, person)
        denom = jnp.maximum(person["y_mask"].sum(), 1.0) * 204
        mse = jnp.sum(((person["y"] - refined * person["y_mask"][..., None])) ** 2) / denom
        return {"total_loss": mse, "mse": mse}

    def train_batches(self, start_step):
        self._step = start_step
        return self.train_ds.iter_batches(seed=self.cfg.get("seed", 0))

    def val_batches(self):
        return self.val_ds.iter_batches(shuffle=False, infinite=False)

    def on_save(self, state):
        return {"task_step": self._step}

    def on_restore(self, state, extra):
        self._step = int(extra.get("task_step", self._step))
        return state


    @classmethod
    def run_inference(cls, cfg):
        """``--infer`` entry, stage A of the two-stage pipeline
        (reference ``inference/postnet/postnet_infer.example_run``):
        wav -> HuBERT/f0 -> VAE prior sample -> postnet -> lm3d .npy.

        Pre-extracted-feature path: ``infer_hubert_npy`` (and, for the pitch
        variant, ``infer_f0_npy``) skip the on-the-fly HuBERT forward — the
        reference caches the same features as .npy during preprocessing
        (``data_gen/nerf/extract_hubert_mel_f0.py``), and this image gates
        the live HuBERT on a locally-converted checkpoint."""
        from geneface_tpu.inference.postnet_infer import PostnetInfer

        infer = PostnetInfer(cfg)
        hubert = f0 = None
        hubert_npy = cfg.get("infer_hubert_npy", "")
        if hubert_npy:
            hubert = np.load(hubert_npy)
            T = (min(len(hubert), 10**9) // 16) * 16
            hubert = hubert[:T]
            f0_npy = cfg.get("infer_f0_npy", "")
            if f0_npy:
                f0 = np.load(f0_npy)[:T]
        return infer.infer(
            wav_path=cfg.get("infer_audio_source_name"),
            hubert=hubert,
            f0=f0,
            out_npy=cfg.get("infer_out_npy_name", "infer_out/pred_lm3d.npy"),
            temperature=cfg.get("infer_temperature", 1.0),
            seed=cfg.get("seed", 0),
        )
