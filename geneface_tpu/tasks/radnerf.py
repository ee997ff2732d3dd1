"""RAD-NeRF head training task.

Re-design of ``tasks/radnerfs/radnerf.py`` (RADNeRFTask): one jitted
``train_step`` computing render → losses → 3-group Adam update, with the
occupancy sweep as a second jitted function triggered host-side every
``update_extra_interval`` steps (the reference calls it inline under
``no_grad``, ``radnerf.py:188-192``).

Losses (``radnerf.py:194-216``): MSE + per-ray weights entropy
(λ=1e-4) + ambient norm outside the face rect (λ ramped to 0.1 over 250k
steps) + lip-region perceptual loss during the finetune phase.

TPU divergences (deliberate):
- lip finetune uses a **fixed-size** lip patch (config ``lip_patch_size``)
  instead of the per-frame variable rect — variable shapes would recompile
  the step per frame;
- the perceptual lip loss uses :mod:`geneface_tpu.models.lpips` (random-init
  fallback when no pretrained weights are shipped).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from geneface_tpu.data.radnerf_dataset import RADNeRFDataset, get_cond_window
from geneface_tpu.models.lpips import LPIPS, lpips_params_from_npz
from geneface_tpu.models.radnerf import (
    RADNeRF,
    init_occupancy,
    mark_untrained_grid,
    render_rays_radnerf,
    update_extra_state,
)
from geneface_tpu.training.optim import (
    finalize_optimizer,
    multi_group_adam,
    radnerf_label_fn,
)
from geneface_tpu.training.schedules import build_schedule
from geneface_tpu.training.trainer import Task

__all__ = ["RADNeRFTask"]


def model_from_cfg(cfg, cls=RADNeRF, **extra):
    kw = dict(
        cond_type=cfg.get("cond_type", "idexp_lm3d_normalized"),
        cond_out_dim=cfg.get("cond_out_dim", 64),
        cond_win_size=cfg.get("cond_win_size", 1),
        smo_win_size=cfg.get("smo_win_size", 5),
        with_att=cfg.get("with_att", True),
        bound=cfg.get("bound", 1),
        grid_type=cfg.get("grid_type", "tiledgrid"),
        grid_interpolation_type=cfg.get("grid_interpolation_type", "linear"),
        log2_hashmap_size=cfg.get("log2_hashmap_size", 16),
        desired_resolution=cfg.get("desired_resolution", 2048),
        grid_num_levels=cfg.get("grid_num_levels", 8),
        grid_level_dim=cfg.get("grid_level_dim", 4),
        num_layers_ambient=cfg.get("num_layers_ambient", 3),
        hidden_dim_ambient=cfg.get("hidden_dim_ambient", 128),
        ambient_out_dim=cfg.get("ambient_out_dim", 2),
        num_layers_sigma=cfg.get("num_layers_sigma", 3),
        hidden_dim_sigma=cfg.get("hidden_dim_sigma", 128),
        geo_feat_dim=cfg.get("geo_feat_dim", 128),
        num_layers_color=cfg.get("num_layers_color", 2),
        hidden_dim_color=cfg.get("hidden_dim_color", 128),
        individual_embedding_num=cfg.get("individual_embedding_num", 13000),
        individual_embedding_dim=cfg.get("individual_embedding_dim", 4),
        grid_backend=cfg.get("grid_backend", "fused"),
        fused_single_table=cfg.get("fused_single_table", False),
        fused_row_lanes=cfg.get("fused_row_lanes", 256),
        grid_compute_dtype=cfg.get("grid_compute_dtype", "f32"),
        fused_ungroup_coarse=cfg.get("fused_ungroup_coarse", 0),
        ambient_ungroup_coarse=cfg.get("ambient_ungroup_coarse", -1),
        fused_coarse_run=cfg.get("fused_coarse_run", 1),
        grid_bwd_dtype=cfg.get("grid_bwd_dtype", "same"),
        ambient_single_table=cfg.get("ambient_single_table", False),
    )
    kw.update(extra)
    return cls(**kw)


class RADNeRFTask(Task):
    model_cls = RADNeRF

    # ------------------------------------------------------------- build ----
    def build(self):
        cfg = self.cfg
        if (
            cfg.get("grid_backend", "fused") == "fused"
            and cfg.get("fused_ungroup_coarse", 0) == 0
        ):
            import logging

            logging.getLogger("geneface_tpu").info(
                "grid backend: fused SPEED mode (grouped coarse levels; "
                "measured 2-4 dB seed variance on the synthetic scene). For "
                "production-quality training set fused_ungroup_coarse: 4 "
                "(~0.99x baseline step speed; docs/perf_notes.md round 5)."
            )
        self.model = model_from_cfg(cfg, self.model_cls)
        data_dir = cfg.get("binary_data_dir", "data/binary/videos")
        video_id = cfg.get("video_id", "")
        ds_dir = cfg.get("data_dir") or (
            f"{data_dir}/{video_id}" if video_id else data_dir
        )
        self.train_ds = RADNeRFDataset("train", ds_dir, cfg, training=True)
        self.val_ds = RADNeRFDataset("val", ds_dir, cfg, training=True)

        rng = jax.random.PRNGKey(cfg.get("seed", 9999))
        smo = cfg.get("smo_win_size", 5)
        cond0 = jnp.asarray(get_cond_window(self.train_ds.conds, 0, smo))
        params = self.model.init(
            rng, cond0, jnp.zeros((8, 3)), jnp.zeros((8, 3)),
            method=self.model.init_all,
        )

        self.grid_size = cfg.get("grid_size", 128)
        occ = init_occupancy(self.grid_size, cfg.get("bound", 1))
        occ = mark_untrained_grid(
            occ,
            self.train_ds.poses,
            self.train_ds.intrinsics,
            self.grid_size,
            cfg.get("bound", 1),
        )

        schedule = build_schedule(cfg)
        self.tx = multi_group_adam(
            params,
            schedule,
            radnerf_label_fn,
            {"net": 1.0, "grid": 10.0, "att": 5.0},
            b1=cfg.get("optimizer_adam_beta1", 0.9),
            b2=cfg.get("optimizer_adam_beta2", 0.999),
            eps=1e-15,
            clip_grad_norm=cfg.get("clip_grad_norm", 0),
            clip_grad_value=cfg.get("clip_grad_value", 0),
        )
        self.tx = finalize_optimizer(self.tx, cfg)
        opt_state = self.tx.init(params)

        self._step = 0
        self._occ_rng = np.random.RandomState(cfg.get("seed", 9999) + 7)
        self.finetune_lip_flag = False
        self._build_lpips(rng)
        self._build_jits()
        return {"params": params, "opt_state": opt_state, "occ": occ}

    def _build_lpips(self, rng):
        """Perceptual criterion for the lip fine-tune phase
        (``tasks/radnerfs/radnerf.py:34,152``). Frozen — never trained."""
        cfg = self.cfg
        self.lpips = None
        self.lpips_params = None
        if not cfg.get("finetune_lips", True):
            return
        self.lpips = LPIPS()
        weights = cfg.get("lpips_weights", "")
        if weights:
            self.lpips_params = lpips_params_from_npz(weights)
        else:
            # the reference's lip finetune uses RELEASED LPIPS weights
            # (tasks/radnerfs/radnerf.py:34). MEASURED
            # (tools/lpips_lip_study.py, synthetic scene, 1200 steps, lip
            # phase from 400): random-init LPIPS HURTS — lip-rect PSNR
            # 33.76 vs 35.66 with the phase off, full-frame 39.37 vs 41.0.
            # So an unconfigured run fails fast instead of silently burning
            # the lip phase training against noise; set
            # ``allow_random_lpips: true`` to override (tests/ablation).
            if not cfg.get("allow_random_lpips", False):
                raise ValueError(
                    "finetune_lips is enabled but no LPIPS weights are "
                    "configured (cfg key 'lpips_weights') — a random-init "
                    "perceptual net measurably degrades the lip region "
                    "(docs/perf_notes.md). Convert the released torch "
                    "weights with tools/convert_lpips_torch.py and set "
                    "lpips_weights, disable finetune_lips, or set "
                    "allow_random_lpips: true to override."
                )
            import logging

            logging.getLogger("geneface_tpu").warning(
                "LPIPS weights not configured (cfg key 'lpips_weights'); the "
                "lip-finetune perceptual loss will use a RANDOM-INIT network "
                "(allow_random_lpips override active)."
            )
            P = int(cfg.get("lip_patch_size", 64))
            dummy = jnp.zeros((1, P, P, 3))
            self.lpips_params = self.lpips.init(
                jax.random.fold_in(rng, 1), dummy, dummy
            )

    # ----------------------------------------------------------- jit fns ----
    def _render_kwargs(self):
        cfg = self.cfg
        return dict(
            bound=float(cfg.get("bound", 1)),
            min_near=float(cfg.get("min_near", 0.05)),
            dt_gamma=float(cfg.get("dt_gamma", 1.0 / 256)),
            max_steps=int(cfg.get("max_steps", 16)),
            grid_size=self.grid_size,
            # compacted field eval (ops/compaction.py); 0 disables
            mean_samples_per_ray=float(cfg.get("mean_samples_per_ray", 8)),
        )

    def _march_backend(self) -> str:
        return str(self.cfg.get("march_backend", "lattice"))

    def _expand_light_batch(self, batch):
        """Light batches carry pixel indices + uint8 pixels; reconstruct
        rays / bg coords / face mask / float pixels on device."""
        if "inds" not in batch:
            return batch
        from geneface_tpu.utils.camera import bg_coords_device, get_rays_device

        ds = self.train_ds
        inds = batch["inds"]
        rays_o, rays_d, i, j = get_rays_device(
            batch["pose_matrix"], ds.intrinsics, inds, ds.H, ds.W
        )
        fr = batch["face_rect"]
        out = dict(batch)
        out["rays_o"], out["rays_d"] = rays_o, rays_d
        out["bg_coords"] = bg_coords_device(inds, ds.H, ds.W)
        out["face_mask"] = (j >= fr[0]) & (j < fr[1]) & (i >= fr[2]) & (i < fr[3])
        for k in ("gt_img", "bg_img", "bg_torso_img"):
            out[k] = out.pop(f"{k}_u8").astype(jnp.float32) / 255.0
        return out

    def _loss_fn(
        self, params, occ, batch, rng, train: bool, lip: bool = False,
        mspr: float | None = None, latk: int | None = None,
    ):
        cfg = self.cfg
        model = self.model
        batch = self._expand_light_batch(batch)

        cond_feat = model.apply(
            params, batch["cond_wins"], method=model.cal_cond_feat
        )
        ind_codes = params["params"].get("individual_embeddings")
        if ind_codes is not None:
            ind = jax.lax.dynamic_index_in_dim(
                ind_codes, jnp.minimum(batch["idx"], ind_codes.shape[0] - 1),
                keepdims=False,
            )
        else:
            ind = None

        def field_fn(xyz, dirs):
            return model.apply(params, xyz, dirs, cond_feat, ind)

        rk = self._render_kwargs()
        if mspr is not None:
            rk["mean_samples_per_ray"] = mspr
        if latk is not None:
            rk["lattice_K"] = latk
        elif self._march_backend() == "lattice":
            rk["lattice_K"] = int(self.cfg.get("lattice_K", 32))
        out = render_rays_radnerf(
            field_fn,
            batch["rays_o"],
            batch["rays_d"],
            occ,
            bg_color=batch["bg_torso_img"],
            rng=rng if train else None,
            **rk,
        )
        pred = out["rgb_map"]
        gt = batch["gt_img"]
        mse = jnp.mean((pred - gt) ** 2)
        losses = {"mse_loss": mse}
        losses["mean_samples"] = jnp.mean(out["n_samples"].astype(jnp.float32))
        if out.get("march_span") is not None:
            losses["march_span"] = out["march_span"].astype(jnp.float32)

        if train:
            alphas = jnp.clip(out["weights_sum"], 1e-5, 1 - 1e-5)
            losses["weights_entropy_loss"] = jnp.mean(
                -alphas * jnp.log2(alphas) - (1 - alphas) * jnp.log2(1 - alphas)
            )
            losses["ambient_loss"] = jnp.mean(
                out["ambient_sum"] * (~batch["face_mask"])
            )
            step = batch["step"]
            lambda_amb = (
                jnp.minimum(step / 250_000.0, 1.0) * cfg.get("lambda_ambient", 0.1)
            )
            total = (
                mse
                + cfg.get("lambda_weights_entropy", 1e-4)
                * losses["weights_entropy_loss"]
                + lambda_amb * losses["ambient_loss"]
            )
            if lip and self.lpips is not None:
                # lip-phase rays are a [P*P] row-major square patch
                # (radnerf_dataset lip mode); perceptual loss on the patch
                # mirrors tasks/radnerfs/radnerf.py:147-152
                P = int(cfg.get("lip_patch_size", 64))
                pred_p = pred.reshape(1, P, P, 3)
                gt_p = gt.reshape(1, P, P, 3)
                lp = jnp.mean(self.lpips.apply(self.lpips_params, pred_p, gt_p))
                losses["lpips_loss"] = lp
                total = total + cfg.get("lambda_lpips_loss", 0.001) * lp
        else:
            total = mse
        losses["total_loss"] = total
        losses["head_psnr"] = -10.0 * jnp.log(mse) / jnp.log(10.0)
        return total, losses

    # static sample-capacity buckets for the compacted renderer: the
    # reference sizes its CUDA buffers from a running mean step count
    # (renderer.py:98-101,302); here the same signal picks one of a few
    # PRE-COMPILED capacities (static shapes), re-checked every
    # ``capacity_check_interval`` steps with a single lagged D2H fetch.
    SPR_BUCKETS = (2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 10.0, 12.0, 16.0)
    #: static lattice budgets for the parallel march (ops/raymarch.py
    #: march_rays_lattice); retuned from the measured tight-box span
    LATK_BUCKETS = (16, 24, 32, 48, 64, 96, 128)

    def _build_jits(self):
        tx = self.tx

        def _make_train_step(lip: bool, mspr: float | None, latk: int | None):
            @partial(jax.jit, donate_argnums=(0, 1))
            def train_step(params, opt_state, occ, batch, rng):
                (_, losses), grads = jax.value_and_grad(
                    lambda p: self._loss_fn(
                        p, occ, batch, rng, train=True, lip=lip, mspr=mspr,
                        latk=latk,
                    ),
                    has_aux=True,
                )(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                losses["grad_norm"] = optax.global_norm(grads)
                return params, opt_state, losses

            return train_step

        self._make_train_step = _make_train_step
        self._step_fn_cache = {}
        self._spr_bucket = None  # None -> config default capacity
        self._latk_bucket = None  # None -> config default lattice_K
        self._last_losses = None

        train_step = _make_train_step(lip=False, mspr=None, latk=None)
        self._train_step_lip_fn = (
            _make_train_step(lip=True, mspr=None, latk=None)
            if self.lpips is not None
            else None
        )

        @jax.jit
        def val_step(params, occ, batch, rng):
            _, losses = self._loss_fn(params, occ, batch, rng, train=False)
            return losses

        @partial(jax.jit, donate_argnums=(1,))
        def occ_update(params, occ, cond_wins, rng):
            model = self.model
            cond_feat = model.apply(params, cond_wins, method=model.cal_cond_feat)

            def density_fn(x):
                return model.apply(
                    params, x, cond_feat, method=model.density
                )["sigma"]

            return update_extra_state(
                density_fn,
                occ,
                rng,
                grid_size=self.grid_size,
                bound=float(self.cfg.get("bound", 1)),
                density_thresh=float(self.cfg.get("density_thresh", 10)),
            )

        self._train_step_fn = train_step
        self._val_step_fn = val_step
        self._occ_update_fn = occ_update

    # ------------------------------------------------------------- steps ----
    #: leaves whose leading axis is the ray axis -> sharded over the mesh's
    #: data axis by ``place_batch`` (reference DDP equivalent, SURVEY 2.9)
    data_batch_keys = (
        "rays_o", "rays_d", "gt_img", "bg_img", "bg_torso_img",
        "bg_coords", "face_mask",
        "inds", "gt_img_u8", "bg_img_u8", "bg_torso_img_u8",
    )

    def _device_batch(self, batch, step):
        keep = self.data_batch_keys + ("cond_wins", "pose_matrix", "face_rect")
        out = {k: batch[k] for k in keep if k in batch}
        out["idx"] = np.asarray(batch["idx"], np.int32)
        out["step"] = np.asarray(step, np.float32)
        return self.place_batch(out)

    def _maybe_update_occ(self, state, rng):
        """Periodic density-grid refresh, frozen during the lip phase.

        The freeze MATCHES the reference exactly: its gate is
        ``start_finetune_lips = finetune_lips and global_step >
        finetune_lips_start_iter`` — a pure step threshold, not the
        per-step lip/normal alternation — with the comment "when finetuning
        lips, we don't update the density grid and bitfield"
        (``tasks/radnerfs/radnerf.py:188-192``). So after the lip phase
        starts the grid is stale by design in BOTH frameworks; the surface
        the grid marks moved for 200k steps already and the lip phase only
        sharpens texture (see tests/test_radnerf_training.py::
        test_occ_update_freeze_matches_reference_gate).
        """
        cfg = self.cfg
        interval = cfg.get("update_extra_interval", 16)
        in_lip_phase = (
            cfg.get("finetune_lips", True)
            and self._step > cfg.get("finetune_lips_start_iter", 200_000)
        )
        if self._step % interval == 0 and not in_lip_phase:
            # seeded: multi-host runs must pick the same frame so the
            # replicated occupancy state stays bitwise-identical across hosts
            idx = self._occ_rng.randint(len(self.train_ds))
            cond = jnp.asarray(
                get_cond_window(
                    self.train_ds.conds, idx, cfg.get("smo_win_size", 5)
                )
            )
            state = dict(state)
            state["occ"] = self._occ_update_fn(
                state["params"], state["occ"], cond, rng
            )
        return state

    def _maybe_retune_capacity(self, losses):
        """Re-pick the compacted renderer's static capacity bucket from the
        measured mean march count — the TPU analog of the reference's
        mean-count ring buffer (``renderer.py:98-101,302``). One lagged D2H
        fetch every ``capacity_check_interval`` steps; a bucket change costs
        one recompile (cached thereafter)."""
        cfg = self.cfg
        interval = int(cfg.get("capacity_check_interval", 64))
        first = self._last_losses is None
        if losses is None or not (first or self._step % interval == 0):
            return
        # lattice_K retune runs regardless of the compaction setting — the
        # lattice march truncates rays whose occupied span exceeds the budget
        span = losses.get("march_span")
        if span is not None:
            need = 1.15 * float(span)
            self._latk_bucket = min(
                [b for b in self.LATK_BUCKETS if b >= need]
                or [self.LATK_BUCKETS[-1]]
            )
            if need > self.LATK_BUCKETS[-1]:
                import logging

                logging.getLogger("geneface_tpu").warning(
                    "measured march span %.0f cells exceeds the largest "
                    "lattice_K bucket (%d); rays spanning more occupied "
                    "cells will be truncated — consider march_backend: walk",
                    float(span), self.LATK_BUCKETS[-1],
                )
        if not cfg.get("mean_samples_per_ray", 8):
            self._last_losses = float(losses["mean_samples"])
            return
        mean = float(losses["mean_samples"])  # sync point (lagged 1 step)
        self._last_losses = mean
        # headroom over the measured mean: samples beyond the capacity are
        # dropped from the tail rays of the step (the reference drops
        # samples the same way when its pre-sized buffer fills,
        # raymarching.cu:446-457); 1.15 keeps that rare while cutting the
        # padded field eval ~20% vs the old 1.3
        headroom = float(cfg.get("capacity_headroom", 1.15))
        want = min(
            [b for b in self.SPR_BUCKETS if b >= headroom * mean] or [16.0]
        )
        self._spr_bucket = min(want, float(cfg.get("max_steps", 16)))

    def _step_fn(self, lip: bool):
        key = (lip, self._spr_bucket, self._latk_bucket)
        if key not in self._step_fn_cache:
            self._step_fn_cache[key] = self._make_train_step(
                lip=lip, mspr=self._spr_bucket, latk=self._latk_bucket
            )
        return self._step_fn_cache[key]

    def train_step(self, state, batch, rng):
        rng_occ, rng_step = jax.random.split(rng)
        state = self._maybe_update_occ(state, rng_occ)
        dbatch = self._device_batch(batch, self._step)
        # lip-phase batches are square patches emitted by the dataset when
        # finetune_lip_flag is set; they carry an explicit marker
        lip = bool(
            self._train_step_lip_fn is not None and batch.get("is_lip_patch")
        )
        step_fn = self._train_step_lip_fn if lip else self._step_fn(False)
        params, opt_state, losses = step_fn(
            state["params"], state["opt_state"], state["occ"], dbatch, rng_step
        )
        self._maybe_retune_capacity(losses)
        self._step += 1
        # lip-phase flag alternates each step (radnerf.py:162-164)
        cfg = self.cfg
        if (
            cfg.get("finetune_lips", True)
            and self._step > cfg.get("finetune_lips_start_iter", 200_000)
        ):
            self.finetune_lip_flag = not self.finetune_lip_flag
            self.train_ds.finetune_lip_flag = self.finetune_lip_flag
        return (
            {"params": params, "opt_state": opt_state, "occ": state["occ"]},
            losses,
        )

    def val_step(self, state, batch, rng):
        dbatch = self._device_batch(batch, self._step)
        return self._val_step_fn(state["params"], state["occ"], dbatch, rng)

    # ------------------------------------------------------- val rendering ----
    def render_full_frame(self, state, ds=None, idx: int = 0):
        """Render one full frame deterministically (no ray subsampling) —
        the TPU analog of the reference's val-time figure renders
        (``tasks/radnerfs/radnerf.py:202-215,264-265``). Returns
        (img [H, W, 3] float, gt [H, W, 3] float)."""
        from geneface_tpu.utils.camera import get_rays

        cfg = self.cfg
        ds = ds or self.val_ds
        if not hasattr(self, "_frame_render_fn"):
            model = self.model
            rk = self._render_kwargs()
            if self._march_backend() == "lattice":
                rk["lattice_K"] = int(
                    self._latk_bucket or cfg.get("lattice_K", 32)
                )

            @jax.jit
            def frame_fn(params, occ, cond, rays_o, rays_d, bg):
                cond_feat = model.apply(
                    params, cond, method=model.cal_cond_feat
                )
                ind_codes = params["params"].get("individual_embeddings")
                ind = ind_codes[0] if ind_codes is not None else None

                def field_fn(xyz, dirs):
                    return model.apply(params, xyz, dirs, cond_feat, ind)

                out = render_rays_radnerf(
                    field_fn, rays_o, rays_d, occ, bg_color=bg, **rk
                )
                return out["rgb_map"]

            self._frame_render_fn = frame_fn

        sample = ds.samples[idx]
        rays = get_rays(ds.poses[idx], ds.intrinsics, ds.H, ds.W)
        cond = jnp.asarray(
            get_cond_window(ds.conds, idx, cfg.get("smo_win_size", 5))
        )
        gt, torso = ds._images(sample)
        gt = gt[..., :3]
        if torso.shape[-1] == 4:
            alpha = torso[..., 3:]
            bg_torso = torso[..., :3] * alpha + ds.bg_img * (1 - alpha)
        else:
            bg_torso = torso
        img = self._frame_render_fn(
            state["params"], state["occ"], cond,
            jnp.asarray(rays["rays_o"]), jnp.asarray(rays["rays_d"]),
            jnp.asarray(bg_torso.reshape(-1, 3)),
        )
        return np.asarray(img).reshape(ds.H, ds.W, 3), gt

    def on_validation_end(self, state, step, logger):
        if not self.cfg.get("val_render_frame", True):
            return
        img, gt = self.render_full_frame(state)
        mse = float(np.mean((img - gt) ** 2))
        psnr = -10.0 * np.log10(max(mse, 1e-12))
        logger.log_image("val/render", img, step)
        logger.log_scalars({"full_frame_psnr": psnr}, step, prefix="val/")

    # -------------------------------------------------------------- data ----
    def train_batches(self, start_step):
        self._step = start_step
        return self.train_ds.iter_epochs(start_step)

    def val_batches(self):
        # fixed ray batches (no full-frame renders) for fast val sweeps
        for i in range(len(self.val_ds)):
            yield self.val_ds[i]

    def on_restore(self, state, extra):
        self._step = int(extra.get("task_step", self._step))
        return state

    def on_save(self, state):
        return {"task_step": self._step}

    # -------------------------------------------------------------- infer ----
    @classmethod
    def run_inference(cls, cfg):
        """``--infer`` entry: predicted-landmark .npy (``infer_cond_name``,
        stage-A output) -> rendered mp4 (``infer_out_video_name``), driven by
        :class:`geneface_tpu.inference.radnerf_infer.RADNeRFInfer`
        (reference ``inference/nerfs/lm3d_radnerf_infer.example_run``)."""
        import numpy as np

        from geneface_tpu.inference.radnerf_infer import RADNeRFInfer

        infer = RADNeRFInfer(cfg)
        cond_name = cfg.get("infer_cond_name", "")
        lm3d = np.load(cond_name).reshape(-1, 68, 3) if cond_name else None
        return infer.render_video(
            lm3d,
            out_path=cfg.get("infer_out_video_name", "infer_out/out.mp4"),
            audio_path=cfg.get("infer_audio_source_name") or None,
            n_frames=cfg.get("infer_n_frames") or None,
        )
