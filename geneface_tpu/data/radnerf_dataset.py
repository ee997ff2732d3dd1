"""RAD-NeRF per-video dataset: binarized frame store + per-item ray sampling.

Reads the reference's ``trainval_dataset.npy`` format
(``tasks/radnerfs/dataset_utils.py:39-215`` / ``data_gen/nerf/binarizer.py``):
a pickled dict with ``train_samples``/``val_samples`` (per-frame dicts:
``c2w`` [4,4], ``idx``, ``face_rect``, cond features, image arrays or
filenames), global ``H/W/focal/cx/cy``, ``bg_img`` uint8, and the
``idexp_lm3d_mean/std`` normalization stats.

As in the reference, *ray sampling happens in the dataset* (host-side, numpy)
so the device step receives fixed-shape gathered batches: rays_o/d [N,3],
gt/bg/bg_torso pixels [N,3], bg_coords [N,2], face_mask [N], cond window and
6-D pose. Poses are converted to the ngp convention on load
(``dataset_utils.py:84``).
"""

from __future__ import annotations

import os

import numpy as np

from geneface_tpu.utils.camera import (
    convert_poses,
    get_bg_coords,
    get_rays,
    nerf_matrix_to_ngp,
)

__all__ = ["RADNeRFDataset", "smooth_camera_path", "get_cond_window"]


def smooth_camera_path(poses: np.ndarray, kernel_size: int = 7) -> np.ndarray:
    """Sliding-window mean of translations and rotations
    (``dataset_utils.py:16-36``; rotation mean via scipy quaternion mean)."""
    from scipy.spatial.transform import Rotation

    poses = poses.copy()
    N = poses.shape[0]
    K = kernel_size // 2
    trans = poses[:, :3, 3].copy()
    rots = poses[:, :3, :3].copy()
    for i in range(N):
        lo, hi = max(0, i - K), min(N, i + K + 1)
        poses[i, :3, 3] = trans[lo:hi].mean(0)
        try:
            poses[i, :3, :3] = Rotation.from_matrix(rots[lo:hi]).mean().as_matrix()
        except Exception:
            poses[i, :3, :3] = poses[i - 1, :3, :3] if i > 0 else rots[i]
    return poses


def get_cond_window(conds: np.ndarray, index: int, smo_win_size: int) -> np.ndarray:
    """Centered window of per-frame conditions with zero padding at the edges
    (att_mode=2 of ``modules/radnerfs/utils.py:71-103``)."""
    T = conds.shape[0]
    left = index - smo_win_size // 2
    right = index + (smo_win_size - smo_win_size // 2)
    pad_left = max(0, -left)
    pad_right = max(0, right - T)
    win = conds[max(0, left) : min(T, right)]
    if pad_left or pad_right:
        pad = [(pad_left, pad_right)] + [(0, 0)] * (conds.ndim - 1)
        win = np.pad(win, pad)
    return win


class RADNeRFDataset:
    """prefix ∈ {train, val, trainval}."""

    def __init__(
        self,
        prefix: str,
        data_dir: str,
        cfg,
        training: bool | None = None,
        rng: np.random.RandomState | None = None,
    ):
        self.cfg = cfg
        self.rng = rng or np.random.RandomState(cfg.get("seed", 9999))
        # separate stream for epoch shuffling so the prefetching iterator
        # (which requests the next frame index before the current item's ray
        # draw) sees identical values to the synchronous path
        self.order_rng = np.random.RandomState(cfg.get("seed", 9999) + 1)
        ds = np.load(
            os.path.join(data_dir, "trainval_dataset.npy"), allow_pickle=True
        ).tolist()
        if prefix == "train":
            self.samples = list(ds["train_samples"])
        elif prefix == "val":
            self.samples = list(ds["val_samples"])
        elif prefix == "trainval":
            self.samples = list(ds["train_samples"]) + list(ds["val_samples"])
        else:
            raise ValueError(f"bad prefix {prefix}")
        self.prefix = prefix
        self.training = training if training is not None else prefix == "train"

        self.H, self.W = int(ds["H"]), int(ds["W"])
        self.focal = float(ds["focal"])
        self.cx, self.cy = float(ds["cx"]), float(ds["cy"])
        self.near = cfg.get("near", 0.3)
        self.far = cfg.get("far", 0.9)
        self.bg_img = np.asarray(ds["bg_img"], np.float32) / 255.0
        self.idexp_lm3d_mean = ds.get("idexp_lm3d_mean")
        self.idexp_lm3d_std = ds.get("idexp_lm3d_std")
        self.intrinsics = (self.focal, self.focal, self.cx, self.cy)

        self.poses = np.stack(
            [
                nerf_matrix_to_ngp(
                    s["c2w"],
                    scale=cfg.get("camera_scale", 4.0),
                    offset=cfg.get("camera_offset", [0, 0, 0]),
                )
                for s in self.samples
            ]
        )
        if np.isnan(self.poses).any():
            raise ValueError("NaN in c2w poses — check the face tracker output")
        if not self.training and cfg.get("infer_smooth_camera_path", True):
            self.poses = smooth_camera_path(
                self.poses, cfg.get("infer_smooth_camera_path_kernel_size", 7)
            )
        self.poses6 = convert_poses(self.poses)
        self.bg_coords = get_bg_coords(self.H, self.W)[0]  # [H*W, 2]

        cond_type = cfg.get("cond_type", "idexp_lm3d_normalized")
        if cond_type == "deepspeech":
            self.conds = np.stack([s["deepspeech_win"] for s in self.samples])
        elif cond_type == "esperanto":
            self.conds = np.stack([s["esperanto_win"] for s in self.samples])
        elif cond_type == "idexp_lm3d_normalized":
            w = cfg.get("cond_win_size", 1)
            self.conds = np.stack(
                [
                    np.asarray(s["idexp_lm3d_normalized_win"], np.float32).reshape(
                        w, 204
                    )
                    for s in self.samples
                ]
            )
        else:
            raise NotImplementedError(cond_type)

        self.lips_rects = [self._lip_rect(s) for s in self.samples]
        self.finetune_lip_flag = False

        # Native (C++) batch loader: one-time uint8 frame planes, then each
        # step gathers only the sampled pixels and composites torso-over-bg
        # in fixed point — replaces the per-item full-frame float conversion
        # + composite below (geneface_tpu/native/src/gf_native.cpp).
        self.native_loader = None
        if (
            self.training
            and cfg.get("device_rays", True)
            and cfg.get("native_loader", True)
        ):
            try:
                self.native_loader = self._build_native_loader()
            except Exception:
                self.native_loader = None

    def _build_native_loader(self):
        from geneface_tpu.native import NativeBatchLoader, load_library

        if load_library() is None:
            return None

        def to_u8(a):
            a = np.asarray(a)
            if a.dtype == np.uint8:
                return a
            return np.clip(a * 255.0 + 0.5, 0, 255).astype(np.uint8)

        HW = self.H * self.W
        gt = np.stack(
            [to_u8(s["gt_img"]).reshape(HW, -1)[:, :3] for s in self.samples]
        )
        torso = np.stack(
            [to_u8(s["torso_img"]).reshape(HW, -1) for s in self.samples]
        )
        bg = to_u8(self.bg_img).reshape(HW, 3)
        return NativeBatchLoader(gt, torso, bg, n_threads=2)

    def _lip_rect(self, sample):
        """Square lip rect from landmarks (``dataset_utils.py:101-118``);
        stored in the sample dict (binarizer) or derived from ``lms`` if
        present; falls back to the face rect."""
        if "lip_rect" in sample:
            return tuple(int(v) for v in sample["lip_rect"])
        lms = sample.get("lms")
        if lms is None:
            xmin, xmax, ymin, ymax = sample["face_rect"]
            return (int(xmin), int(xmax), int(ymin), int(ymax))
        lips = lms[48:60]
        xmin, xmax = int(lips[:, 1].min()), int(lips[:, 1].max())
        ymin, ymax = int(lips[:, 0].min()), int(lips[:, 0].max())
        cx, cy = (xmin + xmax) // 2, (ymin + ymax) // 2
        half = max(xmax - xmin, ymax - ymin) // 2
        return (
            max(0, cx - half),
            min(self.H, cx + half),
            max(0, cy - half),
            min(self.W, cy + half),
        )

    def __len__(self):
        return len(self.samples)

    def _images(self, sample):
        gt = np.asarray(sample["gt_img"], np.float32)
        torso = np.asarray(sample["torso_img"], np.float32)
        if gt.dtype != np.float32 or gt.max() > 1.5:
            gt = gt / 255.0
        if torso.max() > 1.5:
            torso = torso / 255.0
        return gt, torso

    def __getitem__(self, idx: int) -> dict:
        cfg = self.cfg
        sample = self.samples[idx]

        out = {
            "H": self.H,
            "W": self.W,
            "idx": int(sample.get("idx", idx)),
            "near": self.near,
            "far": self.far,
            "pose": self.poses6[idx : idx + 1],  # [1, 6]
            "pose_matrix": self.poses[idx],
            "lip_rect": self.lips_rects[idx],
        }
        out["cond_wins"] = get_cond_window(
            self.conds, idx, cfg.get("smo_win_size", 5)
        )

        n_rays = cfg.get("n_rays", 65536)
        if self.training:
            if self.finetune_lip_flag:
                # TPU divergence: fixed-size square lip patch instead of the
                # per-frame variable rect (variable shapes would recompile the
                # jitted step each frame). Patch is centered on the lip rect.
                P = int(cfg.get("lip_patch_size", 64))
                xmin, xmax, ymin, ymax = self.lips_rects[idx]
                cx = np.clip((xmin + xmax) // 2, P // 2, self.H - P // 2)
                cy = np.clip((ymin + ymax) // 2, P // 2, self.W - P // 2)
                rect = (cx - P // 2, cx + P // 2, cy - P // 2, cy + P // 2)
                out["lip_rect"] = rect
                out["is_lip_patch"] = True
                rays = get_rays(
                    self.poses[idx], self.intrinsics, self.H, self.W,
                    rect=rect, n_rays=1, rng=self.rng,
                )
            else:
                rays = get_rays(
                    self.poses[idx], self.intrinsics, self.H, self.W,
                    n_rays=n_rays, rng=self.rng,
                )
        else:
            rays = get_rays(self.poses[idx], self.intrinsics, self.H, self.W)
        inds = rays["inds"]
        device_rays = cfg.get("device_rays", True) and self.training
        if device_rays:
            # light batch: indices + uint8 pixels; rays / bg coords / face
            # mask are recomputed on device inside the jitted step (shrinks
            # the per-step host->device payload ~3.5x)
            out["inds"] = inds.astype(np.int32)
            out["face_rect"] = np.asarray(sample["face_rect"], np.float32)
        else:
            out["rays_o"] = rays["rays_o"].astype(np.float32)
            out["rays_d"] = rays["rays_d"].astype(np.float32)
            xmin, xmax, ymin, ymax = sample["face_rect"]
            out["face_mask"] = (
                (rays["j"] >= xmin)
                & (rays["j"] < xmax)
                & (rays["i"] >= ymin)
                & (rays["i"] < ymax)
            )
            out["bg_coords"] = self.bg_coords[inds].astype(np.float32)

        if device_rays and self.native_loader is not None:
            gt_u8, bg_u8, bgt_u8 = self.native_loader.gather(idx, inds)
            out["gt_img_u8"] = gt_u8
            out["bg_img_u8"] = bg_u8
            out["bg_torso_img_u8"] = bgt_u8
            return out

        gt_img, torso_img = self._images(sample)
        # torso composited onto bg acts as the head's background
        # (dataset_utils.py:190-206)
        bg_flat = self.bg_img.reshape(-1, 3)
        if torso_img.shape[-1] == 4:
            alpha = torso_img[..., 3:]
            bg_torso = torso_img[..., :3] * alpha + self.bg_img * (1 - alpha)
        else:
            bg_torso = torso_img
        bg_torso_flat = bg_torso.reshape(-1, 3)
        gt_flat = gt_img.reshape(-1, gt_img.shape[-1])[:, :3]

        if device_rays:
            to_u8 = lambda a: np.clip(a * 255.0 + 0.5, 0, 255).astype(np.uint8)
            out["bg_img_u8"] = to_u8(bg_flat[inds])
            out["bg_torso_img_u8"] = to_u8(bg_torso_flat[inds])
            out["gt_img_u8"] = to_u8(gt_flat[inds])
        else:
            out["bg_img"] = bg_flat[inds]
            out["bg_torso_img"] = bg_torso_flat[inds]
            out["gt_img"] = gt_flat[inds]
        return out

    def iter_epochs(
        self, start_step: int = 0, shuffle: bool = True, prefetch: bool = True
    ):
        """Infinite per-frame iterator (batch size 1, as the reference).

        With ``prefetch`` a single worker thread assembles the next batch
        while the caller's device step runs (numpy/native gathers release the
        GIL). Item order and RNG draws are identical to the synchronous path;
        only ``finetune_lip_flag`` toggles take effect one item late.
        """

        def indices():
            while True:
                order = np.arange(len(self))
                if shuffle:
                    self.order_rng.shuffle(order)
                yield from order

        it = indices()
        if not prefetch:
            for i in it:
                yield self[int(i)]
            return

        # one-ahead pipeline on a daemon worker thread (a bare thread rather
        # than ThreadPoolExecutor: abandoned generators must not leave
        # non-daemon threads to join at interpreter shutdown)
        import queue
        import threading

        jobs: queue.Queue = queue.Queue(maxsize=2)
        results: queue.Queue = queue.Queue(maxsize=2)

        def worker():
            while True:
                i = jobs.get()
                if i is None:
                    return
                try:
                    results.put((self[int(i)], None))
                except BaseException as e:  # surface in the consumer
                    results.put((None, e))
                    return

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            jobs.put(int(next(it)))
            for i in it:
                jobs.put(int(i))
                item, err = results.get()
                if err is not None:
                    raise err
                yield item
        finally:
            try:
                jobs.put_nowait(None)
            except queue.Full:
                pass
