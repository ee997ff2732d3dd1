"""Landmark post-processing for NeRF inference.

Re-implementations of the prediction-cleanup pipeline in
``inference/nerfs/lm3d_radnerf_infer.py:34-78`` and
``inference/nerfs/lm3d_nerf_infer.py:61-130``: per-region clamping of the
normalized idexp landmarks, EMA temporal smoothing (λ_lip 0.2), LLE
projection toward the training manifold, periodic eye blinks, silence →
closed mouth, and gaussian smoothing.
"""

from __future__ import annotations

import numpy as np

from geneface_tpu.models.postnet.lle import compute_lle_projection

__all__ = [
    "clamp_lm3d_regions",
    "ema_smooth_lm3d",
    "lle_project_lm3d",
    "gaussian_smooth_lm3d",
    "inject_blinks",
    "inject_blinks_from_gt",
    "close_mouth_when_silent",
    "get_win_conds",
]

REGIONS = {
    "jaw": slice(0, 17),
    "brow": slice(17, 27),
    "nose": slice(27, 36),
    "eye": slice(36, 48),
    "mouth": slice(48, 68),
}


def clamp_lm3d_regions(lm: np.ndarray, clamp_std: float = 2.5) -> np.ndarray:
    """Per-region clamp of normalized lm3d [T, 68, 3]
    (``lm3d_radnerf_infer.py:55-61``): brow/eye x,y get half the band."""
    lm = lm.copy()
    lm[:, REGIONS["jaw"]] = np.clip(lm[:, REGIONS["jaw"]], -clamp_std, clamp_std)
    lm[:, REGIONS["brow"], 0:2] = np.clip(
        lm[:, REGIONS["brow"], 0:2], -clamp_std / 2, clamp_std / 2
    )
    lm[:, REGIONS["brow"], 2] = np.clip(lm[:, REGIONS["brow"], 2], -clamp_std, clamp_std)
    lm[:, REGIONS["nose"]] = np.clip(lm[:, REGIONS["nose"]], -clamp_std, clamp_std)
    lm[:, REGIONS["eye"], 0:2] = np.clip(
        lm[:, REGIONS["eye"], 0:2], -clamp_std / 2, clamp_std / 2
    )
    lm[:, REGIONS["eye"], 2] = np.clip(lm[:, REGIONS["eye"], 2], -clamp_std, clamp_std)
    lm[:, REGIONS["mouth"]] = np.clip(lm[:, REGIONS["mouth"]], -clamp_std, clamp_std)
    return lm


def ema_smooth_lm3d(
    lm: np.ndarray, lambda_other: float = 0.2, lambda_lip: float = 0.2
) -> np.ndarray:
    """Causal EMA per region (``lm3d_radnerf_infer.py:63-72``)."""
    lm = lm.copy()
    moving = lm[0].copy()
    for i in range(len(lm)):
        for name, sl in REGIONS.items():
            lam = lambda_lip if name == "mouth" else lambda_other
            lm[i, sl] = lam * moving[sl] + (1 - lam) * lm[i, sl]
        moving = lm[i].copy()
    return lm


def lle_project_lm3d(
    lm: np.ndarray, database: np.ndarray, percent: float, K: int = 10
) -> np.ndarray:
    """Blend toward the LLE projection onto the GT manifold
    (``lm3d_nerf_infer.py:71-76``). lm [T, 68, 3]; database [N, 68*3]."""
    if percent <= 0:
        return lm
    import jax.numpy as jnp

    K = min(K, len(database))
    feats = lm.reshape(len(lm), -1)
    fused, _ = compute_lle_projection(
        jnp.asarray(feats), jnp.asarray(database.reshape(len(database), -1)), K
    )
    fused = np.asarray(fused).reshape(lm.shape)
    return (1 - percent) * lm + percent * fused


def gaussian_smooth_lm3d(lm: np.ndarray, sigma: float) -> np.ndarray:
    """Temporal gaussian smoothing (``lm3d_nerf_infer.py:126-130``)."""
    if sigma <= 0:
        return lm
    from scipy.ndimage import gaussian_filter1d

    return gaussian_filter1d(lm, sigma=sigma, axis=0)


def inject_blinks(
    lm: np.ndarray, closed_eye_lm: np.ndarray, period_s: float = 5.0,
    fps: int = 25, blink_frames: int = 5,
) -> np.ndarray:
    """Periodic eye blinks: ramp to the closed-eye landmarks and back
    (``lm3d_nerf_infer.py:79-105``, mode "period")."""
    lm = lm.copy()
    period = int(period_s * fps)
    for start in range(period, len(lm) - blink_frames, period):
        for j in range(blink_frames):
            w = 1.0 - abs(j - blink_frames // 2) / (blink_frames // 2 + 1e-6)
            lm[start + j, REGIONS["eye"]] = (
                w * closed_eye_lm[REGIONS["eye"]]
                + (1 - w) * lm[start + j, REGIONS["eye"]]
            )
    return lm


def inject_blinks_from_gt(
    lm: np.ndarray,
    gt_lm_db: np.ndarray,
    mode: str = "none",
    ref_start: int | None = None,
    ref_end: int | None = None,
) -> np.ndarray:
    """Replace the brow+eye region (landmarks 17:48) with GT-derived motion
    (``lm3d_nerf_infer.py:79-105``).

    - ``period``: tile one GT blink segment ``[ref_start, ref_end]`` over the
      whole sequence;
    - ``gt``: tile the ENTIRE GT brow+eye sequence;
    - ``none``: no-op.

    ``lm`` [T, 68, 3] normalized; ``gt_lm_db`` [N, 68, 3] normalized GT.
    """
    if mode == "none":
        return lm
    db = gt_lm_db.reshape(len(gt_lm_db), 68, 3)
    if mode == "period":
        if ref_start is None or ref_end is None:
            raise ValueError(
                "period blink mode needs infer_eye_blink_ref_frames_"
                "start/end_idx (a GT blink segment)"
            )
        pattern = db[ref_start : ref_end + 1, 17:48]
    elif mode == "gt":
        pattern = db[:, 17:48]
    else:
        raise NotImplementedError(f"blink mode {mode}")
    reps = len(lm) // len(pattern) + 1
    tiled = np.concatenate([pattern] * reps, axis=0)[: len(lm)]
    out = lm.copy()
    out[:, 17:48] = tiled
    return out


def close_mouth_when_silent(
    lm: np.ndarray, mel: np.ndarray, closed_mouth_lm: np.ndarray,
    energy_thresh: float = -4.0,
) -> np.ndarray:
    """Silence → closed mouth via mel energy (``lm3d_nerf_infer.py:107-124``).
    mel [2T, 80] (100 fps); lm [T, 68, 3] (25 fps... 50fps half)."""
    lm = lm.copy()
    energy = mel.mean(-1)
    T = len(lm)
    for i in range(T):
        e = energy[min(2 * i, len(energy) - 1)]
        if e < energy_thresh:
            lm[i, REGIONS["mouth"]] = closed_mouth_lm[REGIONS["mouth"]]
    return lm


def get_win_conds(conds: np.ndarray, idx: int, smo_win_size: int,
                  pad_option: str = "edge") -> np.ndarray:
    """Centered window with edge padding (``data_gen/nerf/binarizer.py:24``)."""
    left = idx - smo_win_size // 2
    right = idx + (smo_win_size - smo_win_size // 2)
    pad_l, pad_r = max(0, -left), max(0, right - len(conds))
    win = conds[max(0, left) : min(len(conds), right)]
    if pad_l or pad_r:
        if pad_option == "edge":
            win = np.concatenate(
                [np.repeat(win[:1], pad_l, 0), win, np.repeat(win[-1:], pad_r, 0)]
            )
        else:
            pad = [(pad_l, pad_r)] + [(0, 0)] * (win.ndim - 1)
            win = np.pad(win, pad)
    return win
