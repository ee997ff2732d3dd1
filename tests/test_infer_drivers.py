"""Single-model inference drivers: audio2motion + audio2pose."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.make_synthetic_lrs3 import make_lrs3, make_pose  # noqa: E402

from geneface_tpu.config import Config  # noqa: E402
from geneface_tpu.training.trainer import Trainer  # noqa: E402
from tests.test_upstream_tasks import _base  # noqa: E402


@pytest.fixture(scope="module")
def lrs3_dir(tmp_path_factory):
    return make_lrs3(str(tmp_path_factory.mktemp("lrs3_inf")))


@pytest.fixture(scope="module")
def pose_dir(tmp_path_factory):
    return make_pose(str(tmp_path_factory.mktemp("pose_inf")))


def test_audio2motion_infer(lrs3_dir, tmp_path):
    from geneface_tpu.inference.audio2motion_infer import Audio2MotionInfer
    from geneface_tpu.tasks.audio2motion import VAESyncAudio2MotionTask

    wd = str(tmp_path / "a2m")
    Trainer(VAESyncAudio2MotionTask(_base(wd, lrs3_dir, lambda_kl=0.5))).fit()

    infer = Audio2MotionInfer(Config(audio2motion_work_dir=wd))
    hubert = np.random.RandomState(0).randn(32, 1024).astype(np.float32)
    out_npy = str(tmp_path / "pred.npy")
    lm = infer.infer(hubert=hubert, out_npy=out_npy)
    assert lm.shape == (16, 68, 3)
    assert np.all(np.isfinite(lm))
    assert os.path.exists(out_npy)
    assert np.load(out_npy).shape == (1, 16, 204)


def test_audio2pose_infer(pose_dir, tmp_path):
    from geneface_tpu.inference.audio2pose_infer import Audio2PoseInfer
    from geneface_tpu.tasks.audio2pose import Audio2PoseTask

    wd = str(tmp_path / "a2p")
    cfg = _base(wd, pose_dir, seq_len=32, batch_size=2, recept_field=16)
    Trainer(Audio2PoseTask(cfg)).fit()

    infer = Audio2PoseInfer(
        Config(audio2pose_work_dir=wd, recept_field=16, audio_in_dim=58)
    )
    feat = np.random.RandomState(0).randn(12, 58).astype(np.float32)
    out_npy = str(tmp_path / "c2w.npy")
    c2w = infer.infer(audio_feat=feat, out_npy=out_npy)
    assert c2w.shape == (12, 4, 4)
    assert np.all(np.isfinite(c2w))
    # bottom row of each homogeneous matrix
    np.testing.assert_allclose(c2w[:, 3], np.tile([0, 0, 0, 1], (12, 1)))
    assert os.path.exists(out_npy)
