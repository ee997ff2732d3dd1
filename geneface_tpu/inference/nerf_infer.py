"""Vanilla-NeRF inference drivers: full-frame renders → talking-head mp4.

Re-design of the reference's vanilla-family inference stack
(``inference/nerfs/base_nerf_infer.py:49-317`` + ``lm3d_nerf_infer.py`` +
``adnerf_infer.py``): load the trained head (and optionally torso)
checkpoint, build per-frame condition windows (landmark post-processing for
the lm3d variant, DeepSpeech windows for ADNeRF), render each dataset pose
full-frame through the coarse+fine renderer in fixed-size ray chunks
(``max_ray_batch``, static shapes for one compile), and mux frames + audio
into an mp4.

TPU notes: the chunk renderer is one jitted function over a padded
``[max_ray_batch, 3]`` ray slab; the frame loop streams chunks so the whole
512² frame (262,144 rays × (64+128) samples in the reference config) never
materializes at once — the analog of ``batchify_render_rays``
(``modules/nerfs/commons/volume_rendering.py:213-231``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from geneface_tpu.data.nerf_dataset import NeRFDataset
from geneface_tpu.data.radnerf_dataset import get_cond_window
from geneface_tpu.inference.landmark_postprocess import (
    clamp_lm3d_regions,
    close_mouth_when_silent,
    gaussian_smooth_lm3d,
    get_win_conds,
    inject_blinks_from_gt,
    lle_project_lm3d,
)
from geneface_tpu.inference.radnerf_infer import save_mp4
from geneface_tpu.ops import render_rays
from geneface_tpu.utils import get_last_checkpoint, load_checkpoint

__all__ = ["LM3dNeRFInfer", "ADNeRFInfer"]


class BaseVanillaNeRFInfer:
    """Shared machinery: checkpoint/dataset loading + chunked frame render."""

    #: task class providing ``make_model`` (set by subclasses)
    task_cls: type = None

    def __init__(self, cfg, work_dir: str | None = None):
        self.cfg = cfg
        work_dir = work_dir or cfg.get("work_dir")
        ckpt = load_checkpoint(get_last_checkpoint(work_dir))

        task = self.task_cls(cfg)
        self.torso = hasattr(task, "make_torso_model")
        self.model = task.make_model()
        self.torso_model = task.make_torso_model() if self.torso else None
        self.params = jax.tree_util.tree_map(
            jnp.asarray, ckpt["state"]["params"]
        )
        if self.torso:
            head_dir = cfg.get("head_model_dir")
            head_ckpt = load_checkpoint(get_last_checkpoint(head_dir))
            self.head_params = jax.tree_util.tree_map(
                jnp.asarray, head_ckpt["state"]["params"]
            )

        data_dir = cfg.get("data_dir") or (
            f"{cfg.get('binary_data_dir', 'data/binary/videos')}/"
            f"{cfg.get('video_id', '')}"
        )
        self.dataset = NeRFDataset("trainval", data_dir, cfg, training=False)
        self.chunk = int(cfg.get("max_ray_batch", 4096))
        self._chunk_jit = jax.jit(self._render_chunk)

    # -- condition extraction (per subclass) ---------------------------------
    def get_conds(self, **kwargs) -> np.ndarray:
        """→ per-frame condition array indexable by ``get_cond_window``."""
        raise NotImplementedError

    # -- render ---------------------------------------------------------------
    def _render_chunk(self, params_pack, rays, bg, cond_wins, cond1,
                      euler, trans):
        """``rays``: head-only → (ro, rd); torso → (ro_head, rd_head, ro, rd)
        with head rays at the CURRENT pose and torso rays at the CANONICAL
        pose, as in training (``tasks/nerfs/adnerf_torso.py:141-180``)."""
        cfg = self.cfg
        n_s = int(cfg.get("n_samples_per_ray", 64))
        n_f = int(cfg.get("n_samples_per_ray_fine", 128))
        near, far = cfg.get("near", 0.3), cfg.get("far", 0.9)
        with_att = bool(cfg.get("with_att", True))

        if self.torso:
            params, head_params = params_pack
            ro_h, rd_h, ro_t, rd_t = rays
            vd_h = rd_h / jnp.linalg.norm(rd_h, axis=-1, keepdims=True)
            vd_t = rd_t / jnp.linalg.norm(rd_t, axis=-1, keepdims=True)
            head = self.model
            head_feat = head.apply(
                head_params, cond_wins if with_att else cond1, with_att,
                method=head.cal_cond_feat,
            )

            def head_query(pts, fine):
                return head.apply(head_params, pts, head_feat, vd_h, fine)

            head_out = render_rays(
                head_query, ro_h, rd_h, near, far, bg,
                n_samples=n_s, n_importance=n_f, rng=None,
            )
            torso = self.torso_model
            torso_feat = torso.apply(
                params, cond_wins, euler, trans,
                color=head_out["rgb_map"] if cfg.get("use_color", True) else None,
                with_att=True, method=torso.cal_cond_feat,
            )

            def torso_query(pts, fine):
                return torso.apply(params, pts, torso_feat, vd_t, fine)

            torso_out = render_rays(
                torso_query, ro_t, rd_t, near, far, bg,
                n_samples=n_s, n_importance=n_f, rng=None,
            )
            # head-over-torso composite (tasks/nerfs torso training target)
            return (
                head_out["rgb_map"] * torso_out["last_weight"][:, None]
                + torso_out["rgb_map_fg"]
            )

        (params,) = params_pack
        ro, rd = rays
        vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        model = self.model
        cond_feat = model.apply(
            params, cond_wins if with_att else cond1, with_att,
            method=model.cal_cond_feat,
        )

        def query(pts, fine):
            return model.apply(params, pts, cond_feat, vd, fine)

        out = render_rays(
            query, ro, rd, near, far, bg,
            n_samples=n_s, n_importance=n_f, rng=None,
        )
        return out["rgb_map"]

    def render_frame(self, frame_idx: int, conds: np.ndarray) -> np.ndarray:
        """Full-frame render at the dataset pose ``frame_idx % len(ds)``,
        chunked over ``max_ray_batch`` rays (``base_nerf_infer`` drives
        ``run_model(infer=True)`` per frame; chunking per
        ``volume_rendering.py:213-231``)."""
        ds = self.dataset
        cfg = self.cfg
        i = frame_idx % len(ds)
        item = ds[i]
        ro, rd = item["rays_o"], item["rays_d"]
        bg = item["bg_img"]
        if self.torso:
            # torso rays at the canonical pose, head rays at the current pose
            ro_t, rd_t, _ = ds.full_sampler(
                ds.H, ds.W, ds.focal, ds.c2w_t0, cx=ds.cx, cy=ds.cy
            )
            ray_arrays = (ro, rd, ro_t.astype(np.float32), rd_t.astype(np.float32))
        else:
            ray_arrays = (ro, rd)
        N = ro.shape[0]
        smo = cfg.get("smo_win_size", 5)
        cond_wins = jnp.asarray(get_cond_window(conds, frame_idx, smo))
        cond1 = jnp.asarray(conds[min(frame_idx, len(conds) - 1)][None])
        euler = jnp.asarray(ds.eulers[i : i + 1])
        trans = jnp.asarray(ds.transs[i : i + 1])
        params_pack = (
            (self.params, self.head_params) if self.torso else (self.params,)
        )

        C = self.chunk
        out = np.zeros((N, 3), np.float32)
        for lo in range(0, N, C):
            hi = min(lo + C, N)
            pad = C - (hi - lo)
            sl = slice(lo, hi)

            def padded(a):
                return jnp.asarray(np.pad(a[sl], ((0, pad), (0, 0)), mode="edge"))

            rgb = self._chunk_jit(
                params_pack, tuple(padded(a) for a in ray_arrays),
                padded(bg), cond_wins, cond1, euler, trans,
            )
            out[sl] = np.asarray(rgb)[: hi - lo]
        side_h = int(round(ds.H * float(cfg.get("infer_scale_factor", 1.0))))
        side_w = N // max(side_h, 1)
        return out.reshape(side_h, side_w, 3)

    def render_video(
        self,
        conds: np.ndarray,
        out_path: str = "infer_out/pred_video/out.mp4",
        audio_path: str | None = None,
        n_frames: int | None = None,
    ) -> str:
        T = n_frames or len(conds)
        frames = []
        for i in range(T):
            frame = self.render_frame(i, conds)
            frames.append((np.clip(frame, 0, 1) * 255).astype(np.uint8))
        return save_mp4(np.stack(frames), out_path, audio_path=audio_path)


class LM3dNeRFInfer(BaseVanillaNeRFInfer):
    """Landmark-conditioned vanilla NeRF inference
    (``inference/nerfs/lm3d_nerf_infer.py``): the full prediction-cleanup
    pipeline — per-region clamp, LLE projection, eye-blink injection
    (none/period/gt), silence → closed mouth, gaussian smoothing — then
    window stacking."""

    @property
    def task_cls(self):
        from geneface_tpu.tasks.lm3d_nerf import Lm3dNeRFTask, Lm3dNeRFTorsoTask

        head_dir = self.cfg.get("head_model_dir")
        return Lm3dNeRFTorsoTask if head_dir else Lm3dNeRFTask

    def get_conds(
        self,
        idexp_lm3d: np.ndarray,
        wav_path: str | None = None,
    ) -> np.ndarray:
        """Raw predicted idexp lm3d [T, 68, 3] → per-frame cond windows
        [T, W, 204] after the 5-step cleanup (``lm3d_nerf_infer.py:61-130``)."""
        cfg = self.cfg
        ds = self.dataset
        # the vanilla dataset conds are already normalized [T, W, 204]
        db = np.asarray(ds.conds[:, 0]).reshape(-1, 68, 3)
        mean = ds.idexp_lm3d_mean
        std = ds.idexp_lm3d_std
        lm = idexp_lm3d.reshape(-1, 68, 3).astype(np.float32)
        if mean is not None and std is not None:
            lm = (lm - np.asarray(mean)) / np.asarray(std)
        lm = clamp_lm3d_regions(lm, cfg.get("infer_lm3d_clamp_std", 2.5))
        lle_percent = cfg.get("infer_lm3d_lle_percent", 0.0)
        if lle_percent > 0:
            lm = lle_project_lm3d(lm, db, lle_percent)
        lm = inject_blinks_from_gt(
            lm, db,
            mode=cfg.get("infer_inject_eye_blink_mode", "none"),
            ref_start=cfg.get("infer_eye_blink_ref_frames_start_idx"),
            ref_end=cfg.get("infer_eye_blink_ref_frames_end_idx"),
        )
        if cfg.get("infer_close_mouth_when_sil", False) and wav_path:
            from geneface_tpu.utils.audio import load_wav16k, melspectrogram

            mel = melspectrogram(load_wav16k(wav_path)).T
            ref = int(cfg.get("infer_sil_ref_frame_idx", 0))
            lm = close_mouth_when_silent(lm, mel, db[ref])
        sigma = cfg.get("infer_lm3d_smooth_sigma", 0.0)
        lm = gaussian_smooth_lm3d(lm, sigma)
        flat = lm.reshape(-1, 204).astype(np.float32)
        W = cfg.get("cond_win_size", 1)
        return np.stack(
            [get_win_conds(flat, i, W, "edge") for i in range(len(flat))]
        )

    def run(self, pred_lm3d_npy: str, out_path: str,
            audio_path: str | None = None, n_frames: int | None = None) -> str:
        """Stage-B entry: predicted-landmark .npy → .mp4
        (``lm3d_nerf_infer.example_run``)."""
        lm3d = np.load(pred_lm3d_npy)
        lm3d = lm3d.reshape(-1, 68, 3)
        conds = self.get_conds(lm3d, wav_path=audio_path)
        return self.render_video(
            conds, out_path, audio_path=audio_path, n_frames=n_frames
        )


class ADNeRFInfer(BaseVanillaNeRFInfer):
    """DeepSpeech-conditioned vanilla NeRF inference
    (``inference/nerfs/adnerf_infer.py``): per-frame [16, 29] DeepSpeech
    windows as the condition."""

    @property
    def task_cls(self):
        from geneface_tpu.tasks.lm3d_nerf import ADNeRFTask, ADNeRFTorsoTask

        head_dir = self.cfg.get("head_model_dir")
        return ADNeRFTorsoTask if head_dir else ADNeRFTask

    def get_conds(self, deepspeech_win: np.ndarray) -> np.ndarray:
        """[T, 16, 29] DeepSpeech windows pass through unchanged."""
        return np.asarray(deepspeech_win, np.float32)

    def run(self, deepspeech_npy: str, out_path: str,
            audio_path: str | None = None, n_frames: int | None = None) -> str:
        conds = self.get_conds(np.load(deepspeech_npy))
        return self.render_video(
            conds, out_path, audio_path=audio_path, n_frames=n_frames
        )
