"""Video preprocessing: the 9 subtasks of ``data_util/process.py`` (SURVEY
§2.8 row 1), re-designed as composable functions.

Fully implemented here (no external models needed): wav extraction (1),
mel/f0/HuBERT audio features (2), frame extraction (3), background
reconstruction by nearest-background-pixel fill (5), head/torso/gt image
extraction with seam in-painting (6), transforms export (9).

Pluggable (external model checkpoints are not shipped in this image):
face parsing (4) takes a ``parse_fn(frame)->mask``; landmarks (7) a
``lm_fn(frame)->[68,2]``; face tracking (8) uses
:mod:`geneface_tpu.datagen.face_tracker` with a caller-provided
:class:`FaceBasis`.

Mask convention (BiSeNet classes collapsed as the reference does,
``data_util/process.py:42-66``): 0=background, 1=head/face, 2=neck,
3=torso/body.
"""

from __future__ import annotations

import json
import os
import subprocess

import numpy as np

__all__ = [
    "extract_wav16k",
    "extract_frames",
    "reconstruct_background",
    "split_head_torso",
    "export_transforms",
    "process_video",
]


def _has_ffmpeg() -> bool:
    import shutil

    return shutil.which("ffmpeg") is not None


def extract_wav16k(video_path: str, out_wav: str | None = None) -> str:
    """Task 1: → 16 kHz mono wav (``process.py:9-16``). Uses the ffmpeg CLI
    when present; .wav sources are handled natively (scipy resample)."""
    out_wav = out_wav or os.path.splitext(video_path)[0] + "_16k.wav"
    if video_path.endswith(".wav"):
        from scipy.io import wavfile

        from geneface_tpu.utils.audio import SR, load_wav16k

        wav = load_wav16k(video_path)
        wavfile.write(out_wav, SR, (wav * 32767).astype(np.int16))
        return out_wav
    if not _has_ffmpeg():
        raise RuntimeError(
            "extracting audio from a video container needs the ffmpeg CLI "
            "(not in this image); supply a .wav next to the video instead"
        )
    from geneface_tpu.utils.audio import save_wav16k_from_any

    return save_wav16k_from_any(video_path, out_wav)


def extract_frames(video_path: str, out_dir: str, fps: int = 25) -> list[str]:
    """Task 3: decode frames at 25 fps (``process.py:34-41``). cv2's built-in
    FFMPEG demuxer — no CLI dependency."""
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    src_fps = cap.get(cv2.CAP_PROP_FPS) or fps
    step = max(src_fps / fps, 1e-6)
    paths = []
    next_t, i, oi = 0.0, 0, 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i >= next_t - 1e-9:
            p = os.path.join(out_dir, f"{oi:05d}.jpg")
            cv2.imwrite(p, frame, [int(cv2.IMWRITE_JPEG_QUALITY), 98])
            paths.append(p)
            oi += 1
            next_t += step
        i += 1
    cap.release()
    return paths


def reconstruct_background(
    frames: np.ndarray,  # [T, H, W, 3] uint8 (subsampled frames are fine)
    masks: np.ndarray,  # [T, H, W] int (0 = background)
) -> np.ndarray:
    """Task 5 (``process.py:68-122``): accumulate background-labeled pixels
    across frames, then fill holes by nearest observed background pixel
    (the reference uses a kd-tree over mask coordinates; scipy cKDTree)."""
    from scipy.spatial import cKDTree

    T, H, W, _ = frames.shape
    acc = np.zeros((H, W, 3), np.float64)
    cnt = np.zeros((H, W), np.int64)
    for t in range(T):
        bg = masks[t] == 0
        acc[bg] += frames[t][bg]
        cnt[bg] += 1
    seen = cnt > 0
    bg_img = np.zeros((H, W, 3), np.uint8)
    bg_img[seen] = (acc[seen] / cnt[seen, None]).astype(np.uint8)
    if (~seen).any() and seen.any():
        seen_xy = np.argwhere(seen)
        hole_xy = np.argwhere(~seen)
        tree = cKDTree(seen_xy)
        _, idx = tree.query(hole_xy, k=1)
        bg_img[hole_xy[:, 0], hole_xy[:, 1]] = bg_img[
            seen_xy[idx, 0], seen_xy[idx, 1]
        ]
    return bg_img


def _inpaint_down(img: np.ndarray, mask: np.ndarray, rows: int = 6) -> np.ndarray:
    """Vertical downward in-painting of the top seam of a region: each masked
    column pixel copies the first valid pixel above it, with mild darkening —
    the reference's neck/torso seam trick (``process.py:124-264``)."""
    out = img.copy()
    H, W, _ = img.shape
    valid = mask.copy()
    for _ in range(rows):
        shifted = np.roll(valid, 1, axis=0)
        shifted[0] = False
        grow = shifted & ~valid
        src = np.roll(out, 1, axis=0)
        out[grow] = (src[grow].astype(np.float32) * 0.98).astype(np.uint8)
        valid |= grow
    return out


def split_head_torso(
    frame: np.ndarray,  # [H, W, 3] uint8
    mask: np.ndarray,  # [H, W] int {0 bg, 1 head, 2 neck, 3 torso}
    bg_img: np.ndarray,  # [H, W, 3] uint8
) -> dict:
    """Task 6: produce gt/head/torso(+alpha) images (``process.py:124-264``).

    - ``gt_img``: original frame.
    - ``head_img``: head pixels over the clean background.
    - ``torso_img``: RGBA — neck+torso pixels (alpha=255) over transparent,
      with the neck seam in-painted downward so the head NeRF can composite
      over it without a visible gap.
    """
    head = mask == 1
    body = (mask == 2) | (mask == 3)
    head_img = bg_img.copy()
    head_img[head] = frame[head]

    torso_rgb = np.zeros_like(frame)
    torso_rgb[body] = frame[body]
    torso_rgb = _inpaint_down(torso_rgb, body)
    alpha = ((body | (torso_rgb.sum(-1) > 0)) * 255).astype(np.uint8)
    torso_img = np.concatenate([torso_rgb, alpha[..., None]], -1)
    return {"gt_img": frame, "head_img": head_img, "torso_img": torso_img}


def export_transforms(
    out_dir: str,
    track: dict,  # fit_sequence output: euler [T,3], trans [T,3], focal
    H: int,
    W: int,
    face_rects: list,
    val_every: int = 11,
) -> tuple[str, str]:
    """Task 9: write ``transforms_{train,val}.json`` (``process.py:283-383``):
    per-frame **c2w** (inverse of the tracked w2c), focal/cx/cy, face rects,
    1-in-``val_every`` frames to val."""
    from geneface_tpu.utils.camera import euler_trans_to_c2w

    euler, trans = np.asarray(track["euler"]), np.asarray(track["trans"])
    w2c = euler_trans_to_c2w(euler, trans)  # rot/trans as a 4x4
    c2w = np.linalg.inv(w2c)
    frames = [
        {
            "img_id": i,
            "transform_matrix": c2w[i].tolist(),
            "face_rect": [int(v) for v in face_rects[i]],
        }
        for i in range(len(c2w))
    ]
    base = {
        "focal_len": float(track["focal"]),
        "cx": W / 2.0,
        "cy": H / 2.0,
        "frames": None,
    }
    train = dict(base, frames=[f for i, f in enumerate(frames) if i % val_every])
    val = dict(base, frames=[f for i, f in enumerate(frames) if not i % val_every])
    os.makedirs(out_dir, exist_ok=True)
    ptr = os.path.join(out_dir, "transforms_train.json")
    pva = os.path.join(out_dir, "transforms_val.json")
    with open(ptr, "w") as f:
        json.dump(train, f)
    with open(pva, "w") as f:
        json.dump(val, f)
    return ptr, pva


def process_video(
    video_path: str,
    out_dir: str,
    parse_fn=None,  # (frame u8 [H,W,3]) -> mask int [H,W]
    lm_fn=None,  # (frame u8 [H,W,3]) -> [68,2] float pixel coords
    basis=None,  # FaceBasis for tracking
    full_basis=None,  # face_renderer.FullFaceBasis -> photometric refine
    fps: int = 25,
    max_frames: int | None = None,
    wav_path: str | None = None,  # pre-extracted audio; skips task 1
    fan_npz: str | None = None,  # converted 2DFAN4 weights -> in-repo lm_fn
) -> dict:
    """End-to-end orchestration of tasks 1–9 (``data_gen/nerf/process_data.sh``).

    Returns a manifest dict with all produced paths/arrays; binarize with
    :func:`geneface_tpu.datagen.binarizer.binarize_video`.
    """
    from geneface_tpu.datagen.face_tracker import fit_sequence
    from geneface_tpu.utils.audio import (
        extract_f0,
        extract_hubert,
        load_wav16k,
        melspectrogram,
    )

    os.makedirs(out_dir, exist_ok=True)
    audio = {"mel": None, "f0": None, "hubert": None}
    if wav_path is None and (video_path.endswith(".wav") or _has_ffmpeg()):
        wav_path = extract_wav16k(
            video_path, os.path.join(out_dir, "aud_16k.wav")
        )
    if wav_path is not None:
        wav = load_wav16k(wav_path)
        audio = {
            "mel": melspectrogram(wav),
            "f0": extract_f0(wav),
            "hubert": extract_hubert(wav),  # None without a local checkpoint
        }

    frame_paths = extract_frames(
        video_path, os.path.join(out_dir, "frames"), fps
    )
    if max_frames:
        frame_paths = frame_paths[:max_frames]
    import cv2

    frames = np.stack(
        [cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB) for p in frame_paths]
    )
    T, H, W, _ = frames.shape

    if parse_fn is None:
        raise ValueError(
            "face parsing needs a parse_fn (BiSeNet weights are not shipped); "
            "see geneface_tpu.datagen.face_parser"
        )
    masks = np.stack([parse_fn(f) for f in frames])
    bg_img = reconstruct_background(frames, masks)

    splits = [split_head_torso(frames[t], masks[t], bg_img) for t in range(T)]

    if lm_fn is None and fan_npz:
        # in-repo FAN detector (datagen/face_landmarker.py) seeded by the
        # parser's head mask — the reference's external face_alignment call
        # (data_util/process.py:50-65) with converted weights
        from geneface_tpu.datagen.face_landmarker import FANLandmarker

        fan = FANLandmarker.from_npz(fan_npz)
        lms = np.stack([fan(frames[t], masks[t]) for t in range(T)])
    elif lm_fn is None:
        raise ValueError(
            "landmark extraction needs an lm_fn (68-point) or fan_npz "
            "(converted 2DFAN4 weights, tools/convert_fan_torch.py)"
        )
    else:
        lms = np.stack([lm_fn(f) for f in frames])  # [T, 68, 2]
    rects = []
    for t in range(T):
        xs, ys = lms[t, :, 1], lms[t, :, 0]
        rects.append(
            (int(xs.min()), int(xs.max()) + 1, int(ys.min()), int(ys.max()) + 1)
        )

    if basis is None:
        raise ValueError("face tracking needs a FaceBasis (see basis_from_bfm)")
    track = fit_sequence(lms, basis, H, W)
    if full_basis is not None:
        # photometric refinement against the real frames (the reference's
        # differentiable-render stages, face_tracker.py:225-385)
        from geneface_tpu.datagen.face_tracker import refine_photometric

        track = refine_photometric(
            track, full_basis, frames.astype(np.float32) / 255.0, lms, H, W
        )
    export_transforms(out_dir, track, H, W, rects)

    return {
        "out_dir": out_dir,
        "wav_path": wav_path,
        "audio": audio,
        "frames": frames,
        "masks": masks,
        "bg_img": bg_img,
        "splits": splits,
        "lms": lms,
        "track": track,
        "face_rects": rects,
        "H": H,
        "W": W,
    }
