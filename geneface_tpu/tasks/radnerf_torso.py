"""RAD-NeRF torso training task.

Re-design of ``tasks/radnerfs/radnerf_torso.py``: loads the trained head
checkpoint non-strict into the torso model (``:30-47``), freezes every
non-torso parameter (optax ``set_to_zero`` on the frozen label — the
functional analog of ``not_requires_grad``), and trains the 2-D torso
deformation field with MSE against ``bg_torso_img`` plus torso alpha entropy
(``run_model:76-113``). Optimizer groups: torso nets ×1, torso grid ×10
(``ExponentialScheduleForRADNeRFTorso``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from geneface_tpu.data.radnerf_dataset import get_cond_window
from geneface_tpu.models.radnerf import (
    RADNeRFTorso,
    init_occupancy,
    init_torso_occupancy,
    mark_untrained_grid,
    render_rays_radnerf_torso,
    update_torso_occupancy,
)
from geneface_tpu.tasks.radnerf import RADNeRFTask, model_from_cfg
from geneface_tpu.training.optim import finalize_optimizer, multi_group_adam
from geneface_tpu.training.schedules import build_schedule
from geneface_tpu.utils import get_last_checkpoint, load_checkpoint, restore_partial

__all__ = ["RADNeRFTorsoTask"]


def torso_label_fn(path: str) -> str:
    if "torso_embeddings" in path:
        return "grid"
    if "torso" in path or "head_aware" in path:
        return "net"
    return "frozen"


class RADNeRFTorsoTask(RADNeRFTask):
    model_cls = RADNeRFTorso

    def build(self):
        cfg = self.cfg
        self.model = model_from_cfg(
            cfg,
            RADNeRFTorso,
            torso_shrink=cfg.get("torso_shrink", 0.8),
            torso_individual_embedding_dim=cfg.get("torso_individual_embedding_dim", 8),
            torso_head_aware=cfg.get("torso_head_aware", False),
        )
        from geneface_tpu.data.radnerf_dataset import RADNeRFDataset

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
        torso_occ = init_torso_occupancy(self.grid_size)

        # warm-start head params + head occupancy from the head experiment
        head_dir = cfg.get("head_model_dir", "")
        if head_dir:
            ckpt_path = get_last_checkpoint(head_dir) or head_dir
            head_ckpt = load_checkpoint(ckpt_path)
            params = {
                "params": restore_partial(
                    params["params"], head_ckpt["state"]["params"]["params"],
                    silent=True,
                )
            }
            if "occ" in head_ckpt["state"]:
                occ_saved = head_ckpt["state"]["occ"]
                occ = occ.__class__(
                    jnp.asarray(occ_saved[0]),
                    jnp.asarray(occ_saved[1]),
                    jnp.asarray(occ_saved[2]),
                )
            print(f"| loaded head model from {ckpt_path}")
        else:
            occ = mark_untrained_grid(
                occ, self.train_ds.poses, self.train_ds.intrinsics,
                self.grid_size, cfg.get("bound", 1),
            )

        schedule = build_schedule(cfg)
        self.tx = multi_group_adam(
            params,
            schedule,
            torso_label_fn,
            {"net": 1.0, "grid": 10.0, "frozen": 0.0},
            b1=cfg.get("optimizer_adam_beta1", 0.9),
            b2=cfg.get("optimizer_adam_beta2", 0.999),
            eps=1e-15,
        )
        # hard-freeze: zero updates for the head (multiplier 0 keeps Adam
        # state but never moves the params)
        self.tx = finalize_optimizer(self.tx, cfg)
        opt_state = self.tx.init(params)

        self._step = 0
        self._occ_rng = np.random.RandomState(cfg.get("seed", 9999) + 7)
        self.finetune_lip_flag = False
        self._build_jits()
        return {
            "params": params,
            "opt_state": opt_state,
            "occ": occ,
            "torso_occ": torso_occ,
        }

    # ----------------------------------------------------------------------
    def _loss_fn_torso(self, params, occ, torso_occ, batch, rng, train: bool):
        cfg = self.cfg
        model = self.model
        batch = self._expand_light_batch(batch)
        cond_feat = model.apply(params, batch["cond_wins"], method=model.cal_cond_feat)
        ind_codes = params["params"].get("individual_embeddings")
        ind = (
            jax.lax.dynamic_index_in_dim(
                ind_codes, jnp.minimum(batch["idx"], ind_codes.shape[0] - 1),
                keepdims=False,
            )
            if ind_codes is not None
            else None
        )
        t_codes = params["params"].get("torso_individual_codes")
        t_ind = (
            jax.lax.dynamic_index_in_dim(
                t_codes, jnp.minimum(batch["idx"], t_codes.shape[0] - 1),
                keepdims=False,
            )
            if t_codes is not None
            else None
        )
        pose6 = batch["pose"]

        def field_fn(xyz, dirs):
            return model.apply(params, xyz, dirs, cond_feat, ind)

        def torso_fn(xy, head_img, head_ws):
            return model.apply(
                params, xy, pose6, t_ind, head_img, head_ws,
                method=model.forward_torso,
            )

        out = render_rays_radnerf_torso(
            field_fn, torso_fn,
            batch["rays_o"], batch["rays_d"], batch["bg_coords"],
            occ, torso_occ,
            bound=float(cfg.get("bound", 1)),
            min_near=float(cfg.get("min_near", 0.05)),
            dt_gamma=float(cfg.get("dt_gamma", 1.0 / 256)),
            max_steps=int(cfg.get("max_steps", 16)),
            grid_size=self.grid_size,
            density_thresh_torso=float(cfg.get("density_thresh_torso", 0.01)),
            bg_color=batch["bg_img"],
            rng=rng if train else None,
        )
        if cfg.get("torso_train_mode", 1) == 1:
            pred, gt = out["torso_rgb_map"], batch["bg_torso_img"]
        else:
            pred, gt = out["rgb_map"], batch["gt_img"]
        mse = jnp.mean((pred - gt) ** 2)
        losses = {"torso_mse_loss": mse}
        alphas = jnp.clip(out["torso_alpha_map"], 1e-5, 1 - 1e-5)
        losses["torso_weights_entropy_loss"] = jnp.mean(
            -alphas * jnp.log2(alphas) - (1 - alphas) * jnp.log2(1 - alphas)
        )
        total = mse + cfg.get("lambda_weights_entropy", 1e-4) * losses[
            "torso_weights_entropy_loss"
        ]
        losses["total_loss"] = total
        losses["torso_psnr"] = -10.0 * jnp.log(mse) / jnp.log(10.0)
        return total, losses

    def _build_jits(self):
        tx = self.tx

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, occ, torso_occ, batch, rng):
            (_, losses), grads = jax.value_and_grad(
                lambda p: self._loss_fn_torso(p, occ, torso_occ, batch, rng, True),
                has_aux=True,
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, losses

        @jax.jit
        def val_step(params, occ, torso_occ, batch, rng):
            _, losses = self._loss_fn_torso(params, occ, torso_occ, batch, rng, False)
            return losses

        @partial(jax.jit, donate_argnums=(1,))
        def occ_update(params, torso_occ, pose6, t_ind, rng):
            model = self.model

            def alpha_fn(xy):
                a, _, _ = model.apply(
                    params, xy, pose6, t_ind, method=model.forward_torso
                )
                return a[:, 0]

            return update_torso_occupancy(
                alpha_fn, torso_occ, rng, grid_size=self.grid_size
            )

        self._train_step_fn = train_step
        self._val_step_fn = val_step
        self._occ_update_fn = occ_update

    def _maybe_update_occ(self, state, rng):
        interval = self.cfg.get("update_extra_interval", 16)
        if self._step % interval == 0:
            # seeded: multi-host runs must pick the same frame so the
            # replicated occupancy state stays bitwise-identical across hosts
            idx = self._occ_rng.randint(len(self.train_ds))
            pose6 = jnp.asarray(self.train_ds.poses6[idx : idx + 1])
            t_codes = state["params"]["params"].get("torso_individual_codes")
            t_ind = t_codes[idx % t_codes.shape[0]] if t_codes is not None else None
            state = dict(state)
            state["torso_occ"] = self._occ_update_fn(
                state["params"], state["torso_occ"], pose6, t_ind, rng
            )
        return state

    def train_step(self, state, batch, rng):
        rng_occ, rng_step = jax.random.split(rng)
        state = self._maybe_update_occ(state, rng_occ)
        dbatch = self._device_batch(batch, self._step)
        dbatch.update(self.place_batch({"pose": batch["pose"]}))
        params, opt_state, losses = self._train_step_fn(
            state["params"], state["opt_state"], state["occ"],
            state["torso_occ"], dbatch, rng_step,
        )
        self._step += 1
        return (
            {
                "params": params, "opt_state": opt_state,
                "occ": state["occ"], "torso_occ": state["torso_occ"],
            },
            losses,
        )

    def val_step(self, state, batch, rng):
        dbatch = self._device_batch(batch, self._step)
        dbatch.update(self.place_batch({"pose": batch["pose"]}))
        return self._val_step_fn(
            state["params"], state["occ"], state["torso_occ"], dbatch, rng
        )

    def render_full_frame(self, state, ds=None, idx: int = 0):
        """Full head+torso composite of one val frame (torso analog of
        ``RADNeRFTask.render_full_frame``; reference logs these figures at
        ``tasks/radnerfs/radnerf.py:264-265``)."""
        from geneface_tpu.data.radnerf_dataset import get_cond_window
        from geneface_tpu.utils.camera import get_rays

        cfg = self.cfg
        ds = ds or self.val_ds
        if not hasattr(self, "_frame_render_fn"):
            model = self.model

            @jax.jit
            def frame_fn(
                params, occ, torso_occ, cond, pose6, t_ind,
                rays_o, rays_d, bg_coords, bg,
            ):
                cond_feat = model.apply(
                    params, cond, method=model.cal_cond_feat
                )
                ind_codes = params["params"].get("individual_embeddings")
                ind = ind_codes[0] if ind_codes is not None else None

                def field_fn(xyz, dirs):
                    return model.apply(params, xyz, dirs, cond_feat, ind)

                def torso_fn(xy, head_img, head_ws):
                    return model.apply(
                        params, xy, pose6, t_ind, head_img, head_ws,
                        method=model.forward_torso,
                    )

                out = render_rays_radnerf_torso(
                    field_fn, torso_fn, rays_o, rays_d, bg_coords,
                    occ, torso_occ,
                    bound=float(cfg.get("bound", 1)),
                    min_near=float(cfg.get("min_near", 0.05)),
                    dt_gamma=float(cfg.get("dt_gamma", 1.0 / 256)),
                    max_steps=int(cfg.get("max_steps", 16)),
                    grid_size=self.grid_size,
                    density_thresh_torso=float(
                        cfg.get("density_thresh_torso", 0.01)
                    ),
                    bg_color=bg,
                )
                return out["rgb_map"]

            self._frame_render_fn = frame_fn

        sample = ds.samples[idx]
        rays = get_rays(ds.poses[idx], ds.intrinsics, ds.H, ds.W)
        cond = jnp.asarray(
            get_cond_window(ds.conds, idx, cfg.get("smo_win_size", 5))
        )
        t_codes = state["params"]["params"].get("torso_individual_codes")
        t_ind = t_codes[idx % t_codes.shape[0]] if t_codes is not None else None
        gt = ds._images(sample)[0][..., :3]
        img = self._frame_render_fn(
            state["params"], state["occ"], state["torso_occ"], cond,
            jnp.asarray(ds.poses6[idx : idx + 1]), t_ind,
            jnp.asarray(rays["rays_o"]), jnp.asarray(rays["rays_d"]),
            jnp.asarray(ds.bg_coords), jnp.asarray(ds.bg_img.reshape(-1, 3)),
        )
        return np.asarray(img).reshape(ds.H, ds.W, 3), gt
