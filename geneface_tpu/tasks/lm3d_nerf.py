"""Vanilla (AD-NeRF-style) NeRF training tasks: Lm3dNeRF and ADNeRF.

Re-design of ``tasks/nerfs/{lm3d_nerf.py, adnerf.py}``: uniform rect-weighted
ray sampling, hierarchical coarse+fine rendering (``ops.render_rays``),
MSE + coarse-MSE losses, and the attention-net warm start — before
``no_smo_iterations`` the condition is the single-frame window without the
attention smoother, afterwards the ``smo_win_size`` window with attention
(``tasks/nerfs/adnerf.py`` / ``lm3d_nerf.py:91-96``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from geneface_tpu.data.nerf_dataset import NeRFDataset
from geneface_tpu.models.nerf import ADNeRF, ADNeRFTorso, Lm3dNeRF
from geneface_tpu.ops import render_rays
from geneface_tpu.training.optim import finalize_optimizer, label_params
from geneface_tpu.training.schedules import build_schedule
from geneface_tpu.training.trainer import Task
from geneface_tpu.utils import get_last_checkpoint, load_checkpoint, restore_partial

__all__ = [
    "Lm3dNeRFTask",
    "ADNeRFTask",
    "Lm3dNeRFTorsoTask",
    "ADNeRFTorsoTask",
]


class Lm3dNeRFTask(Task):
    def make_model(self):
        cfg = self.cfg
        return Lm3dNeRF(
            cond_dim=cfg.get("cond_dim", 64),
            hidden_size=cfg.get("hidden_size", 256),
            use_window_cond=cfg.get("use_window_cond", True),
            cond_win_size=cfg.get("cond_win_size", 1),
            smo_win_size=cfg.get("smo_win_size", 5),
            with_att=cfg.get("with_att", True),
        )

    def build(self):
        cfg = self.cfg
        self.model = self.make_model()
        data_dir = cfg.get("data_dir") or (
            f"{cfg.get('binary_data_dir', 'data/binary/videos')}/"
            f"{cfg.get('video_id', '')}"
        )
        self.train_ds = NeRFDataset("train", data_dir, cfg, training=True)
        self.val_ds = NeRFDataset("val", data_dir, cfg, training=True)

        cond0 = jnp.asarray(self.train_ds.conds[:1])
        params = self.model.init(
            jax.random.PRNGKey(cfg.get("seed", 9999)),
            jnp.asarray(
                self.train_ds.conds[: cfg.get("smo_win_size", 5)]
            ),
            jnp.zeros((4, 8, 3)),
            jnp.zeros((4, 3)),
            method=self.model.init_all,
        )
        schedule = build_schedule(cfg)
        # two groups as the reference's ExponentialScheduleWithAudattNet:
        # attention net lr x5 (schedulers.py:88-113)
        def label(path):
            return "att" if ("att" in path and "encoder" in path) or "audatt" in path else "net"

        def group(mult):
            return optax.chain(
                optax.scale_by_adam(
                    b1=cfg.get("optimizer_adam_beta1", 0.9),
                    b2=cfg.get("optimizer_adam_beta2", 0.999),
                ),
                optax.scale_by_learning_rate(lambda s: schedule(s) * mult),
            )

        self.tx = finalize_optimizer(
            optax.multi_transform(
                {"net": group(1.0), "att": group(5.0)},
                label_params(params, label),
            ),
            cfg,
        )
        opt_state = self.tx.init(params)
        self._step = 0
        self._build_jits()
        return {"params": params, "opt_state": opt_state}

    def _loss_fn(self, params, batch, rng, train: bool, with_att: bool):
        cfg = self.cfg
        model = self.model
        cond = batch["cond_wins"] if with_att else batch["cond"]
        cond_feat = model.apply(
            params, cond, with_att, method=model.cal_cond_feat
        )
        viewdirs = batch["rays_d"] / jnp.linalg.norm(
            batch["rays_d"], axis=-1, keepdims=True
        )

        def query_fn(pts, fine):
            return model.apply(params, pts, cond_feat, viewdirs, fine)

        out = render_rays(
            query_fn,
            batch["rays_o"], batch["rays_d"],
            cfg.get("near", 0.3), cfg.get("far", 0.9),
            batch["bg_img"],
            n_samples=cfg.get("n_samples_per_ray", 16),
            n_importance=cfg.get("n_samples_per_ray_fine", 16),
            rng=rng if train else None,
        )
        mse = jnp.mean((out["rgb_map"] - batch["gt_img"]) ** 2)
        losses = {"mse_loss": mse}
        if "rgb_map_coarse" in out:
            losses["mse_loss_coarse"] = jnp.mean(
                (out["rgb_map_coarse"] - batch["gt_img"]) ** 2
            )
        total = sum(losses.values())
        losses["total_loss"] = total
        losses["psnr"] = -10.0 * jnp.log(mse) / jnp.log(10.0)
        return total, losses

    def _build_jits(self):
        tx = self.tx

        @partial(jax.jit, donate_argnums=(0, 1), static_argnums=(4,))
        def train_step(params, opt_state, batch, rng, with_att):
            (_, losses), grads = jax.value_and_grad(
                lambda p: self._loss_fn(p, batch, rng, True, with_att),
                has_aux=True,
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, losses

        @partial(jax.jit, static_argnums=(3,))
        def val_step(params, batch, rng, with_att):
            _, losses = self._loss_fn(params, batch, rng, False, with_att)
            return losses

        self._train_step_fn = train_step
        self._val_step_fn = val_step

    def _with_att(self):
        return (
            self.cfg.get("with_att", True)
            and self._step >= self.cfg.get("no_smo_iterations", 0)
        )

    data_batch_keys = ("rays_o", "rays_d", "gt_img", "bg_img")

    def _device_batch(self, batch):
        keys = self.data_batch_keys + ("cond", "cond_wins")
        return self.place_batch({k: batch[k] for k in keys})

    def train_step(self, state, batch, rng):
        params, opt_state, losses = self._train_step_fn(
            state["params"], state["opt_state"], self._device_batch(batch),
            rng, self._with_att(),
        )
        self._step += 1
        return {"params": params, "opt_state": opt_state}, losses

    def val_step(self, state, batch, rng):
        return self._val_step_fn(
            state["params"], self._device_batch(batch), rng, self._with_att()
        )

    def train_batches(self, start_step):
        self._step = start_step
        return self.train_ds.iter_epochs(start_step)

    def val_batches(self):
        for i in range(len(self.val_ds)):
            yield self.val_ds[i]

    def on_save(self, state):
        return {"task_step": self._step}

    def on_restore(self, state, extra):
        self._step = int(extra.get("task_step", self._step))
        return state


    # -------------------------------------------------------------- infer ----
    @classmethod
    def run_inference(cls, cfg):
        """``--infer`` entry: predicted-landmark .npy -> full-frame mp4 via
        :class:`geneface_tpu.inference.nerf_infer.LM3dNeRFInfer`
        (reference ``inference/nerfs/lm3d_nerf_infer.example_run``)."""
        from geneface_tpu.inference.nerf_infer import LM3dNeRFInfer

        infer = LM3dNeRFInfer(cfg)
        return infer.run(
            cfg["infer_cond_name"],
            out_path=cfg.get("infer_out_video_name", "infer_out/out.mp4"),
            audio_path=cfg.get("infer_audio_source_name") or None,
            n_frames=cfg.get("infer_n_frames") or None,
        )


class ADNeRFTask(Lm3dNeRFTask):
    """DeepSpeech-conditioned variant (``tasks/nerfs/adnerf.py``)."""

    def make_model(self):
        cfg = self.cfg
        return ADNeRF(
            cond_dim=cfg.get("cond_dim", 64),
            hidden_size=cfg.get("hidden_size", 256),
        )


    @classmethod
    def run_inference(cls, cfg):
        """DeepSpeech-window .npy -> mp4 via
        :class:`geneface_tpu.inference.nerf_infer.ADNeRFInfer`
        (reference ``inference/nerfs/adnerf_infer``)."""
        from geneface_tpu.inference.nerf_infer import ADNeRFInfer

        infer = ADNeRFInfer(cfg)
        return infer.run(
            cfg["infer_cond_name"],
            out_path=cfg.get("infer_out_video_name", "infer_out/out.mp4"),
            audio_path=cfg.get("infer_audio_source_name") or None,
            n_frames=cfg.get("infer_n_frames") or None,
        )


class Lm3dNeRFTorsoTask(Lm3dNeRFTask):
    """Torso stage of the vanilla NeRF cascade
    (``tasks/nerfs/lm3d_nerf_torso.py`` / ``adnerf_torso.py``).

    The frozen head model renders the selected pixels at the *current* pose;
    the torso field — conditioned on cond windows, freq-encoded head pose and
    optionally the rendered head color — renders the same pixels in the
    *canonical* pose (``c2w_t0``, lower image half). Composite
    ``rgb_com = head_rgb * last_weight_torso + rgb_fg_torso`` is trained
    with MSE against the full ``gt_img`` (``adnerf_torso.py:141-180``).

    Divergence from the reference: the torso is conditioned on the task's own
    ``cond_wins`` (lm3d windows here, deepspeech windows in :class:`ADNeRF
    TorsoTask`) instead of always ``deepspeech_wins`` — the reference's lm3d
    torso silently requires deepspeech features even for landmark-driven
    videos (``tasks/nerfs/lm3d_nerf_torso.py:96``), which the TPU re-design
    drops in favor of one conditioning stream per experiment.
    """

    def make_torso_model(self):
        cfg = self.cfg
        return ADNeRFTorso(
            cond_dim=cfg.get("cond_dim", 64),
            hidden_size=cfg.get("hidden_size", 256),
            use_color=cfg.get("use_color", True),
            cond_win_size=cfg.get("cond_win_size", 1),
            smo_win_size=cfg.get("smo_win_size", 5),
        )

    def build(self):
        cfg = self.cfg
        self.model = self.make_model()  # frozen head
        self.torso_model = self.make_torso_model()
        data_dir = cfg.get("data_dir") or (
            f"{cfg.get('binary_data_dir', 'data/binary/videos')}/"
            f"{cfg.get('video_id', '')}"
        )
        self.train_ds = NeRFDataset("train", data_dir, cfg, training=True)
        self.val_ds = NeRFDataset("val", data_dir, cfg, training=True)

        rng = jax.random.PRNGKey(cfg.get("seed", 9999))
        k_head, k_torso = jax.random.split(rng)
        smo = cfg.get("smo_win_size", 5)
        head_params = self.model.init(
            k_head,
            jnp.asarray(self.train_ds.conds[:smo]),
            jnp.zeros((4, 8, 3)),
            jnp.zeros((4, 3)),
            method=self.model.init_all,
        )
        head_dir = cfg.get("head_model_dir", "")
        if head_dir:
            ckpt_path = get_last_checkpoint(head_dir)
            if ckpt_path:
                head_params = restore_partial(
                    head_params, load_checkpoint(ckpt_path)["state"]["params"]
                )
        self.head_params = jax.tree.map(jax.lax.stop_gradient, head_params)

        params = self.torso_model.init(
            k_torso,
            jnp.asarray(self.train_ds.conds[:smo]),
            jnp.zeros((4, 8, 3)),
            jnp.zeros((4, 3)),
            method=self.torso_model.init_all,
        )
        schedule = build_schedule(cfg)

        def label(path):
            return "att" if "audatt" in path else "net"

        def group(mult):
            return optax.chain(
                optax.scale_by_adam(
                    b1=cfg.get("optimizer_adam_beta1", 0.9),
                    b2=cfg.get("optimizer_adam_beta2", 0.999),
                ),
                optax.scale_by_learning_rate(lambda s: schedule(s) * mult),
            )

        self.tx = finalize_optimizer(
            optax.multi_transform(
                {"net": group(1.0), "att": group(5.0)},
                label_params(params, label),
            ),
            cfg,
        )
        opt_state = self.tx.init(params)
        self._step = 0
        self._build_jits()
        return {"params": params, "opt_state": opt_state}

    def _loss_fn(self, params, batch, rng, train: bool, with_att: bool):
        cfg = self.cfg
        head, torso = self.model, self.torso_model
        head_params = self.head_params
        cond = batch["cond_wins"] if with_att else batch["cond"]

        # frozen head render at the current pose
        head_feat = head.apply(
            head_params, cond, with_att, method=head.cal_cond_feat
        )
        vd_h = batch["rays_d_head"] / jnp.linalg.norm(
            batch["rays_d_head"], axis=-1, keepdims=True
        )

        def head_query(pts, fine):
            return head.apply(head_params, pts, head_feat, vd_h, fine)

        head_out = render_rays(
            head_query,
            batch["rays_o_head"], batch["rays_d_head"],
            cfg.get("near", 0.3), cfg.get("far", 0.9),
            batch["bg_img"],
            n_samples=cfg.get("n_samples_per_ray", 16),
            n_importance=cfg.get("n_samples_per_ray_fine", 16),
            rng=None,  # deterministic frozen render
        )
        head_out = jax.tree.map(jax.lax.stop_gradient, head_out)

        # torso render in the canonical pose
        use_color = cfg.get("use_color", True)
        torso_feat = torso.apply(
            params,
            batch["cond_wins"],
            batch["euler"],
            batch["trans"],
            color=head_out["rgb_map"] if use_color else None,
            with_att=True,
            method=torso.cal_cond_feat,
        )
        vd_t = batch["rays_d"] / jnp.linalg.norm(
            batch["rays_d"], axis=-1, keepdims=True
        )

        def torso_query(pts, fine):
            return torso.apply(params, pts, torso_feat, vd_t, fine)

        torso_out = render_rays(
            torso_query,
            batch["rays_o"], batch["rays_d"],
            cfg.get("near", 0.3), cfg.get("far", 0.9),
            batch["bg_img"],
            n_samples=cfg.get("n_samples_per_ray", 16),
            n_importance=cfg.get("n_samples_per_ray_fine", 16),
            rng=rng if train else None,
        )

        rgb_com = (
            head_out["rgb_map"] * torso_out["last_weight"][:, None]
            + torso_out["rgb_map_fg"]
        )
        mse = jnp.mean((rgb_com - batch["gt_img"]) ** 2)
        losses = {"com_mse_loss": mse}
        if "rgb_map_coarse" in torso_out and "rgb_map_coarse" in head_out:
            rgb_com0 = (
                head_out["rgb_map_coarse"] * torso_out["last_weight0"][:, None]
                + torso_out["rgb_map_fg0"]
            )
            losses["com_mse_loss_coarse"] = jnp.mean(
                (rgb_com0 - batch["gt_img"]) ** 2
            )
        total = sum(losses.values())
        losses["total_loss"] = total
        losses["com_psnr"] = -10.0 * jnp.log(mse) / jnp.log(10.0)
        return total, losses

    data_batch_keys = (
        "rays_o", "rays_d", "rays_o_head", "rays_d_head", "gt_img", "bg_img",
    )

    def _device_batch(self, batch):
        keys = self.data_batch_keys + ("cond", "cond_wins", "euler", "trans")
        return self.place_batch({k: batch[k] for k in keys})

    def train_batches(self, start_step):
        self._step = start_step
        return self.train_ds.iter_torso_epochs(start_step)

    def val_batches(self):
        for i in range(len(self.val_ds)):
            yield self.val_ds.get_torso_item(i)


class ADNeRFTorsoTask(Lm3dNeRFTorsoTask):
    """DeepSpeech-conditioned torso variant (``tasks/nerfs/adnerf_torso.py``)."""

    run_inference = ADNeRFTask.run_inference

    def make_model(self):
        cfg = self.cfg
        return ADNeRF(
            cond_dim=cfg.get("cond_dim", 64),
            hidden_size=cfg.get("hidden_size", 256),
        )

    def make_torso_model(self):
        cfg = self.cfg
        return ADNeRFTorso(
            cond_dim=cfg.get("cond_dim", 64),
            hidden_size=cfg.get("hidden_size", 256),
            use_color=cfg.get("use_color", False),
            cond_win_size=16,
            smo_win_size=cfg.get("smo_win_size", 8),
        )
