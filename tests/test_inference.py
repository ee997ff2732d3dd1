"""Inference pipeline tests: landmark postprocess + RADNeRF video render."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.make_synthetic_dataset import make_dataset  # noqa: E402

from geneface_tpu.inference.landmark_postprocess import (  # noqa: E402
    clamp_lm3d_regions,
    ema_smooth_lm3d,
    get_win_conds,
    inject_blinks,
)


def test_clamp_and_smooth():
    rng = np.random.RandomState(0)
    lm = rng.randn(20, 68, 3) * 4
    clamped = clamp_lm3d_regions(lm, 2.5)
    assert np.abs(clamped[:, 0:17]).max() <= 2.5
    assert np.abs(clamped[:, 17:27, 0:2]).max() <= 1.25
    sm = ema_smooth_lm3d(clamped)
    # smoothing reduces frame-to-frame jitter
    assert np.abs(np.diff(sm, axis=0)).mean() < np.abs(np.diff(clamped, axis=0)).mean()


def test_win_conds_edge_pad():
    conds = np.arange(10)[:, None].astype(np.float32)
    w = get_win_conds(conds, 0, 5)
    assert w.shape == (5, 1)
    np.testing.assert_array_equal(w[:, 0], [0, 0, 0, 1, 2])
    w = get_win_conds(conds, 9, 5)
    np.testing.assert_array_equal(w[:, 0], [7, 8, 9, 9, 9])


def test_blinks():
    lm = np.zeros((300, 68, 3))
    closed = np.ones((68, 3))
    out = inject_blinks(lm, closed, period_s=2.0, fps=25)
    assert out[:, 36:48].max() > 0  # blinks were injected
    assert out[0, 36:48].max() == 0  # not at the start


def test_radnerf_infer_end_to_end(tmp_path):
    """Train a tiny head briefly, then render a 3-frame video from synthetic
    predicted landmarks (BASELINE config[4] shape, minus audio)."""
    from geneface_tpu.tasks.radnerf import RADNeRFTask
    from geneface_tpu.training.trainer import Trainer
    from geneface_tpu.inference.radnerf_infer import RADNeRFInfer
    from tests.test_radnerf_training import tiny_cfg

    synth = str(tmp_path / "synth")
    make_dataset(synth, n_frames=8, hw=48)
    wd = str(tmp_path / "head")
    cfg = tiny_cfg(synth, wd, max_updates=4, val_check_interval=4)
    Trainer(RADNeRFTask(cfg)).fit()

    infer = RADNeRFInfer(cfg, work_dir=wd, torso=False)
    # synthetic "predicted" landmark sequence in raw idexp space
    mean = np.asarray(infer.dataset.idexp_lm3d_mean)
    std = np.asarray(infer.dataset.idexp_lm3d_std)
    rng = np.random.RandomState(0)
    lm = mean[None] + rng.randn(3, 68, 3) * std[None]
    out = str(tmp_path / "out.mp4")
    path = infer.render_video(idexp_lm3d=lm, out_path=out, n_frames=3)
    assert os.path.exists(path) and os.path.getsize(path) > 0


def test_frame_parallel_matches_sequential(tmp_path):
    """shard_map frame-parallel render (8-device CPU mesh) equals the
    sequential path bit-for-bit modulo uint8 rounding — the TPU analog of the
    reference's DDP frame sharding (base_nerf_infer.py:131-179)."""
    import cv2

    from geneface_tpu.inference.radnerf_infer import RADNeRFInfer
    from geneface_tpu.tasks.radnerf import RADNeRFTask
    from geneface_tpu.training.trainer import Trainer
    from tests.test_radnerf_training import tiny_cfg

    synth = str(tmp_path / "synth")
    make_dataset(synth, n_frames=10, hw=32)
    wd = str(tmp_path / "head")
    cfg = tiny_cfg(synth, wd, max_updates=2, val_check_interval=4)
    Trainer(RADNeRFTask(cfg)).fit()

    infer = RADNeRFInfer(cfg, work_dir=wd, torso=False)
    T = 10  # > 8 devices: exercises the padded last group

    def frames_of(path):
        cap = cv2.VideoCapture(path)
        out = []
        while True:
            ok, f = cap.read()
            if not ok:
                break
            out.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
        cap.release()
        return np.stack(out)

    p_seq = infer.render_video(
        out_path=str(tmp_path / "seq.mp4"), n_frames=T, frame_parallel=False
    )
    p_par = infer.render_video(
        out_path=str(tmp_path / "par.mp4"), n_frames=T, frame_parallel=True
    )
    a, b = frames_of(p_seq), frames_of(p_par)
    assert a.shape == b.shape == (T, 32, 32, 3)
    # mp4 is lossy; compare decoded streams to themselves (identical inputs
    # -> identical encodes) with a tiny tolerance for codec nondeterminism
    diff = np.abs(a.astype(np.int16) - b.astype(np.int16))
    assert diff.max() <= 2, diff.max()
