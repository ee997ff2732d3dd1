"""RAD-NeRF inference pipeline: predicted landmarks → rendered talking-head mp4.

Re-design of ``inference/nerfs/base_nerf_infer.py`` +
``lm3d_radnerf_infer.py``: load the trained head (or head+torso) checkpoint,
build per-frame condition windows from a predicted (or GT) idexp landmark
sequence (normalize → clamp → EMA smooth), take poses/rays/backgrounds from
the person's dataset (optionally with smoothed camera path), render each
frame with the jitted renderer, and mux frames + audio into an mp4 via
ffmpeg (``base_nerf_infer.py:306``).

Multi-chip frame parallelism (the reference's DDP frame sharding,
``base_nerf_infer.py:131-179``): with >1 device, ``render_video`` batches
frames into mesh-sized groups and renders them under ``shard_map`` — each
chip runs the full alive-ray loop on its own frame shard, parameters and
occupancy replicated, no cross-chip collectives (frames are independent,
exactly like the reference's per-rank frame slices).
"""

from __future__ import annotations

import os
import subprocess

import jax
import jax.numpy as jnp
import numpy as np

from geneface_tpu.data.radnerf_dataset import RADNeRFDataset, get_cond_window
from geneface_tpu.inference.landmark_postprocess import (
    clamp_lm3d_regions,
    ema_smooth_lm3d,
    gaussian_smooth_lm3d,
    get_win_conds,
    lle_project_lm3d,
)
from geneface_tpu.models.radnerf import (
    RADNeRF,
    RADNeRFTorso,
    init_occupancy,
    init_torso_occupancy,
    render_rays_radnerf,
    render_rays_radnerf_torso,
)
from geneface_tpu.tasks.radnerf import model_from_cfg
from geneface_tpu.utils import get_last_checkpoint, load_checkpoint

__all__ = ["RADNeRFInfer", "save_mp4", "pick_ray_capacity"]


def pick_ray_capacity(n_hit: int, n_total: int, headroom: float = 1.15,
                      quantum: int = 4096) -> int | None:
    """Static ray-cull capacity from a probed hit count: pad ``headroom``,
    round up to ``quantum`` (the single production recipe — bench and the
    fidelity tool import this rather than re-deriving it)."""
    if n_hit <= 0:
        return None
    cap = int(-(-int(n_hit * headroom) // quantum) * quantum)
    return cap if cap < n_total else None


def save_mp4(frames: np.ndarray, out_path: str, fps: int = 25,
             audio_path: str | None = None) -> str:
    """Frames [T, H, W, 3] (uint8, or float in [0,1]) + audio → mp4
    (``base_nerf_infer.py:306``)."""
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    tmp = out_path + ".noaudio.mp4"
    import cv2

    frames = np.asarray(frames)
    if frames.dtype != np.uint8:
        frames = (np.clip(frames, 0.0, 1.0) * 255).astype(np.uint8)
    h, w = frames.shape[1:3]
    vw = cv2.VideoWriter(tmp, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()
    if audio_path and os.path.exists(audio_path):
        subprocess.run(
            ["ffmpeg", "-y", "-v", "quiet", "-i", tmp, "-i", audio_path,
             "-c:v", "copy", "-c:a", "aac", "-shortest", out_path],
            check=True,
        )
        os.remove(tmp)
    else:
        os.replace(tmp, out_path)
    return out_path


class RADNeRFInfer:
    def __init__(self, cfg, work_dir: str | None = None, torso: bool | None = None):
        self.cfg = cfg
        work_dir = work_dir or cfg.get("work_dir")
        ckpt = load_checkpoint(get_last_checkpoint(work_dir))
        self.state = ckpt["state"]
        self.torso = torso if torso is not None else "torso_occ" in self.state
        cls = RADNeRFTorso if self.torso else RADNeRF
        extra = (
            dict(
                torso_shrink=cfg.get("torso_shrink", 0.8),
                torso_individual_embedding_dim=cfg.get(
                    "torso_individual_embedding_dim", 8
                ),
                torso_head_aware=cfg.get("torso_head_aware", False),
            )
            if self.torso
            else {}
        )
        self.model = model_from_cfg(cfg, cls, **extra)
        self.params = jax.tree_util.tree_map(jnp.asarray, self.state["params"])

        occ_saved = self.state["occ"]
        self.occ = init_occupancy(cfg.get("grid_size", 128), cfg.get("bound", 1))
        self.occ = self.occ.__class__(*[jnp.asarray(x) for x in occ_saved])
        if self.torso:
            t = self.state["torso_occ"]
            self.torso_occ = init_torso_occupancy(cfg.get("grid_size", 128)).__class__(
                *[jnp.asarray(x) for x in t]
            )

        data_dir = cfg.get("data_dir") or (
            f"{cfg.get('binary_data_dir', 'data/binary/videos')}/"
            f"{cfg.get('video_id', '')}"
        )
        self.dataset = RADNeRFDataset("trainval", data_dir, cfg, training=False)
        self._render_jit = jax.jit(
            self._render_frame, static_argnames=("ray_capacity",)
        )
        self._ray_capacity = None  # picked lazily per video (see render_video)
        self._cull_kdop = None  # set alongside the capacity pick
        self._torso_mask = None  # per-video torso occupancy mask

    def _pick_ray_capacity(self, n_probe: int = 4) -> int | None:
        """Static ray-cull capacity for this video: probe hit counts of the
        tight occupied-AABB slab test over a few dataset poses, pad 15% and
        round to 4096 (the TPU-shaped analog of the reference's alive-ray
        counters, ``renderer.py:328-351``)."""
        if not self.cfg.get("infer_ray_cull", True):
            return None
        from geneface_tpu.models.radnerf.renderer import kdop_hit, occupied_kdop

        ds = self.dataset
        bound = float(self.cfg.get("bound", 1))
        min_near = float(self.cfg.get("min_near", 0.05))
        # 13-slab k-DOP of the occupied cells: tighter than the AABB slab
        # test (round-5 cull); computed once per video, reused per frame
        self._cull_kdop = occupied_kdop(self.occ.occ_grid, bound)

        @jax.jit
        def hits(ro, rd):
            return jnp.sum(kdop_hit(ro, rd, self._cull_kdop, min_near))

        n = 0
        N = ds.H * ds.W
        for i in range(0, len(ds), max(1, len(ds) // n_probe))[:n_probe]:
            item = ds[i]
            n = max(n, int(hits(jnp.asarray(item["rays_o"]),
                                jnp.asarray(item["rays_d"]))))
        return pick_ray_capacity(n, N)

    # ------------------------------------------------------------------
    def conds_from_lm3d(self, idexp_lm3d: np.ndarray) -> np.ndarray:
        """Raw predicted idexp lm3d [T, 68, 3] → normalized per-frame cond
        windows [T, W, 204] (``lm3d_radnerf_infer.py:34-78``)."""
        cfg = self.cfg
        mean = np.asarray(self.dataset.idexp_lm3d_mean)
        std = np.asarray(self.dataset.idexp_lm3d_std)
        lm = (idexp_lm3d.reshape(-1, 68, 3) - mean) / std
        lm = clamp_lm3d_regions(lm, cfg.get("infer_lm3d_clamp_std", 2.5))
        lle_percent = cfg.get("infer_lm3d_lle_percent", 0.0)
        if lle_percent > 0:
            db = (
                np.stack([c.reshape(68, 3) for c in self.dataset.conds[:, 0]])
                if self.dataset.conds.ndim == 3
                else None
            )
            if db is not None:
                lm = lle_project_lm3d(lm, db, lle_percent)
        lm = ema_smooth_lm3d(lm)
        sigma = cfg.get("infer_lm3d_smooth_sigma", 0.0)
        lm = gaussian_smooth_lm3d(lm, sigma)
        flat = lm.reshape(-1, 204).astype(np.float32)
        W = cfg.get("cond_win_size", 1)
        return np.stack(
            [get_win_conds(flat, i, W, "edge") for i in range(len(flat))]
        )

    def _render_frame(self, params, occ_and_torso, rays_o, rays_d, bg, bg_coords,
                      cond_wins, pose6, ind_idx, ray_capacity=None,
                      cull_kdop=None, torso_mask=None):
        cfg = self.cfg
        model = self.model
        # GUI-adjustable render knobs (reference radnerf_gui.py:427-465
        # sliders): consulted at TRACE time — the GUI swaps this dict and
        # re-jits per distinct setting (one cached executable per value)
        ov = getattr(self, "_render_overrides", None) or {}
        cond_feat = model.apply(params, cond_wins, method=model.cal_cond_feat)
        ind_codes = params["params"].get("individual_embeddings")
        ind = (
            ind_codes[jnp.asarray(ind_idx, jnp.int32) % ind_codes.shape[0]]
            if ind_codes is not None
            else None
        )

        def field_fn(xyz, dirs):
            return model.apply(params, xyz, dirs, cond_feat, ind)

        # compacted field eval: full frames are mostly empty space, so the
        # per-ray mean valid-sample count is low; capacity comes from config
        # (overflow samples at the back of a ray carry negligible T)
        mspr = float(
            cfg.get(
                "infer_mean_samples_per_ray", cfg.get("mean_samples_per_ray", 8)
            )
            or 0
        )
        kwargs = dict(
            bound=float(cfg.get("bound", 1)),
            min_near=float(cfg.get("min_near", 0.05)),
            dt_gamma=float(ov.get("dt_gamma", cfg.get("dt_gamma", 1.0 / 256))),
            max_steps=int(ov.get("max_steps", cfg.get("max_steps", 16))),
            T_thresh=float(ov.get("T_thresh", cfg.get("infer_T_thresh", 1e-4))),
            grid_size=int(cfg.get("grid_size", 128)),
            mean_samples_per_ray=mspr or None,
            ray_capacity=ray_capacity,
            # parallel bit-packed march (ops/raymarch.py); 0 -> while-loop walk
            lattice_K=int(
                cfg.get("infer_lattice_K", cfg.get("lattice_K", 48))
            )
            or None,
            march_paired=bool(cfg.get("infer_march_paired", True)),
            cull_kdop=cull_kdop,
        )
        if self.torso:
            occ, torso_occ = occ_and_torso
            t_codes = params["params"].get("torso_individual_codes")
            t_ind = t_codes[0] if t_codes is not None else None

            def torso_fn(xy, head_img, head_ws):
                return model.apply(
                    params, xy, pose6, t_ind, head_img, head_ws,
                    method=model.forward_torso,
                )

            out = render_rays_radnerf_torso(
                field_fn, torso_fn, rays_o, rays_d, bg_coords, occ, torso_occ,
                density_thresh_torso=float(cfg.get("density_thresh_torso", 0.01)),
                bg_color=bg, torso_mask=torso_mask, **kwargs,
            )
        else:
            occ = occ_and_torso[0]
            out = render_rays_radnerf(
                field_fn, rays_o, rays_d, occ, bg_color=bg, **kwargs
            )
        return out["rgb_map"]

    # ------------------------------------------------ frame parallelism ----
    def _build_sharded_renderer(self, mesh):
        """shard_map renderer over [F, ...] frame batches: each device runs
        the full alive-ray loop on its F/n_dev local frames (the TPU analog
        of the reference's per-rank frame slices,
        ``base_nerf_infer.py:150-155``)."""
        from jax.sharding import PartitionSpec as P

        shard_map = getattr(jax, "shard_map", None)
        if shard_map is None:  # older jax
            from jax.experimental.shard_map import shard_map

        data_spec = P("data")
        rep = P()

        ray_capacity = self._ray_capacity

        def per_shard(params, occ_pack, ro, rd, b, bc, cw, p6):
            def one(args):
                ro1, rd1, b1, bc1, cw1, p61 = args
                return self._render_frame(
                    params, occ_pack, ro1, rd1, b1, bc1, cw1, p61, 0,
                    ray_capacity=ray_capacity, cull_kdop=self._cull_kdop,
                    torso_mask=self._torso_mask,
                )

            return jax.lax.map(one, (ro, rd, b, bc, cw, p6))

        kwargs = dict(
            mesh=mesh,
            in_specs=(rep, rep) + (data_spec,) * 6,
            out_specs=data_spec,
        )
        try:  # vma tracking chokes on the march while_loop carry; frames are
            fn = shard_map(per_shard, check_vma=False, **kwargs)  # independent
        except TypeError:  # older jax spells it check_rep
            fn = shard_map(per_shard, check_rep=False, **kwargs)
        return jax.jit(fn)

    def render_video(
        self,
        idexp_lm3d: np.ndarray | None = None,
        out_path: str = "infer_out/pred_video/out.mp4",
        audio_path: str | None = None,
        n_frames: int | None = None,
        frame_parallel: bool | None = None,
    ) -> str:
        """Render frames driven by ``idexp_lm3d`` (or GT dataset conds) using
        dataset poses (looped), then mux to mp4.

        ``frame_parallel`` (default: auto — on when >1 device is visible)
        shards frame groups over the device mesh's data axis.
        """
        ds = self.dataset
        cfg = self.cfg
        if idexp_lm3d is not None:
            cond_wins_all = self.conds_from_lm3d(idexp_lm3d)
        else:
            cond_wins_all = ds.conds
        T = n_frames or len(cond_wins_all)
        smo = cfg.get("smo_win_size", 5)
        H, W = ds.H, ds.W
        occ_pack = (self.occ, self.torso_occ) if self.torso else (self.occ,)
        n_dev = len(jax.devices())
        if frame_parallel is None:
            frame_parallel = n_dev > 1 and T >= n_dev
        self._ray_capacity = self._pick_ray_capacity()
        if self.torso:
            # per-video constant (sampling the traced grid per frame costs
            # ~11 ms at 512²; see renderer.torso_occupancy_mask)
            from geneface_tpu.models.radnerf.renderer import (
                torso_occupancy_mask,
            )

            self._torso_mask = torso_occupancy_mask(
                self.torso_occ, jnp.asarray(ds.bg_coords),
                int(cfg.get("grid_size", 128)),
                float(cfg.get("density_thresh_torso", 0.01)),
            )

        def frame_inputs(i):
            item = ds[i % len(ds)]
            cond = get_cond_window(cond_wins_all, i, smo)
            bg_key = "bg_torso_img" if not self.torso else "bg_img"
            return (
                item["rays_o"], item["rays_d"], item[bg_key],
                item["bg_coords"], cond, item["pose"],
            )

        frames = []
        if frame_parallel:
            from geneface_tpu.parallel import make_mesh, shard_batch

            mesh = make_mesh(n_data=n_dev)
            renderer = self._build_sharded_renderer(mesh)
            for lo in range(0, T, n_dev):
                idxs = [min(lo + k, T - 1) for k in range(n_dev)]  # pad w/ last
                stacked = [
                    np.stack([np.asarray(frame_inputs(i)[j]) for i in idxs])
                    for j in range(6)
                ]
                sharded = shard_batch(mesh, tuple(stacked))
                rgb = np.asarray(renderer(self.params, occ_pack, *sharded))
                for k in range(min(n_dev, T - lo)):
                    frame = rgb[k].reshape(H, W, 3)
                    frames.append((np.clip(frame, 0, 1) * 255).astype(np.uint8))
        else:
            for i in range(T):
                inp = frame_inputs(i)
                rgb = self._render_jit(
                    self.params, occ_pack,
                    *[jnp.asarray(v) for v in inp], 0,
                    ray_capacity=self._ray_capacity,
                    cull_kdop=self._cull_kdop,
                    torso_mask=self._torso_mask,
                )
                frame = np.asarray(rgb).reshape(H, W, 3)
                frames.append((np.clip(frame, 0, 1) * 255).astype(np.uint8))
        return save_mp4(np.stack(frames), out_path, audio_path=audio_path)
