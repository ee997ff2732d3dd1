"""End-to-end training of syncnet / audio2motion / postnet / audio2pose."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.make_synthetic_lrs3 import make_lrs3, make_pose  # noqa: E402

from geneface_tpu.config import Config  # noqa: E402
from geneface_tpu.training.trainer import Trainer  # noqa: E402


@pytest.fixture(scope="module")
def lrs3_dir(tmp_path_factory):
    return make_lrs3(str(tmp_path_factory.mktemp("lrs3")))


@pytest.fixture(scope="module")
def pose_dir(tmp_path_factory):
    return make_pose(str(tmp_path_factory.mktemp("pose")))


def _base(work_dir, data_dir, **over):
    cfg = Config(
        data_dir=data_dir,
        work_dir=work_dir,
        lr=1e-3,
        scheduler="none",
        max_updates=4,
        val_check_interval=4,
        tb_log_interval=2,
        num_sanity_val_steps=0,
        eval_max_batches=1,
        seed=0,
        max_tokens=4000,
        syncnet_num_samples_per_batch=32,
    )
    cfg.update(over)
    return cfg


def _metrics(wd):
    return [json.loads(l) for l in open(os.path.join(wd, "metrics.jsonl"))]


def test_syncnet_task(lrs3_dir, tmp_path):
    from geneface_tpu.tasks.syncnet import SyncNetTask

    wd = str(tmp_path / "sync")
    Trainer(SyncNetTask(_base(wd, lrs3_dir))).fit()
    tr = [m for m in _metrics(wd) if "tr/sync_loss" in m]
    assert tr and np.isfinite(tr[-1]["tr/sync_loss"])


def test_audio2motion_task(lrs3_dir, tmp_path):
    from geneface_tpu.tasks.audio2motion import VAESyncAudio2MotionTask

    wd = str(tmp_path / "a2m")
    Trainer(VAESyncAudio2MotionTask(_base(wd, lrs3_dir, lambda_kl=0.5))).fit()
    tr = [m for m in _metrics(wd) if "tr/mse" in m]
    assert tr and np.isfinite(tr[-1]["tr/mse"])
    assert "tr/kl" in tr[-1] and "tr/continuity" in tr[-1]


def test_postnet_task(lrs3_dir, tmp_path):
    from geneface_tpu.tasks.postnet import PostnetAdvSyncTask

    wd = str(tmp_path / "postnet")
    cfg = _base(
        wd, None,
        lrs3_data_dir=lrs3_dir,
        person_data_dir=lrs3_dir,
        postnet_disc_start_steps=1,
        postnet_disc_interval=1,
        postnet_lambda_mse=0.05,
        postnet_lambda_adv=0.85,
        postnet_lambda_sync=0.1,
    )
    Trainer(PostnetAdvSyncTask(cfg)).fit()
    ms = _metrics(wd)
    assert any("tr/mse" in m for m in ms)
    assert any("tr/disc_fake_loss" in m for m in ms)


def test_postnet_pitch_task(lrs3_dir, tmp_path):
    """Pitch-contour postnet variant + reg/continuity losses
    (reference tasks/postnet/lm3d_postnet_adv_sync_pitch.py:160-196)."""
    from geneface_tpu.tasks.postnet import PostnetAdvSyncTask

    wd = str(tmp_path / "postnet_pitch")
    cfg = _base(
        wd, None,
        lrs3_data_dir=lrs3_dir,
        person_data_dir=lrs3_dir,
        audio2motion_task_cls="geneface_tpu.tasks.audio2motion.PitchContourVAESyncTask",
        postnet_disc_start_steps=1,
        postnet_disc_interval=1,
        postnet_lambda_mse=0.05,
        postnet_lambda_adv=0.85,
        postnet_lambda_sync=0.1,
        postnet_lambda_reg=0.02,
        postnet_lambda_continuity=0.10,
    )
    task = PostnetAdvSyncTask(cfg)
    Trainer(task).fit()
    assert task.pitch  # dispatched the PitchContour models
    ms = _metrics(wd)
    tr = [m for m in ms if "tr/reg" in m]
    assert tr and np.isfinite(tr[-1]["tr/reg"])
    assert np.isfinite(tr[-1]["tr/continuity"])
    assert any("tr/disc_fake_loss" in m for m in ms)


def test_audio2pose_task(pose_dir, tmp_path):
    from geneface_tpu.tasks.audio2pose import Audio2PoseTask

    wd = str(tmp_path / "a2p")
    cfg = _base(wd, pose_dir, seq_len=32, batch_size=2, recept_field=16)
    Trainer(Audio2PoseTask(cfg)).fit()
    tr = [m for m in _metrics(wd) if "tr/gmm_loss" in m]
    assert tr and np.isfinite(tr[-1]["tr/gmm_loss"])
