"""Full two-CLI cascade: audio features → postnet lm3d .npy → RAD-NeRF mp4.

VERDICT r4 #4: stage A (``--infer`` on the postnet config → pred lm3d npy)
and stage B (``--infer`` on the radnerf config reading ``infer_cond_name``)
were each e2e-tested but never chained through the two documented CLI
invocations (reference ``README.md:37-63``: ``bash scripts/infer_postnet.sh
&& bash scripts/infer_lm3d_radnerf.sh``). This test trains tiny
a2m+syncnet+postnet+radnerf models, then runs the REAL module CLI twice as
subprocesses, pinning the stage-A→B handoff: npy layout ``[1, T, 68·3]``,
ds mean/std normalization (``inference/radnerf_infer.conds_from_lm3d``),
window stacking, and the mp4 mux.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.make_synthetic_dataset import make_dataset  # noqa: E402
from tools.make_synthetic_lrs3 import make_lrs3  # noqa: E402

from geneface_tpu.config import Config  # noqa: E402
from geneface_tpu.training.trainer import Trainer  # noqa: E402
from tests.test_radnerf_training import tiny_cfg  # noqa: E402
from tests.test_upstream_tasks import _base  # noqa: E402


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    """Train the four tiny models the cascade needs; return their dirs."""
    from geneface_tpu.tasks.audio2motion import VAESyncAudio2MotionTask
    from geneface_tpu.tasks.postnet import PostnetAdvSyncTask
    from geneface_tpu.tasks.radnerf import RADNeRFTask
    from geneface_tpu.tasks.syncnet import SyncNetTask

    root = tmp_path_factory.mktemp("cascade")
    lrs3 = make_lrs3(str(root / "lrs3"))
    synth = str(root / "synth")
    make_dataset(synth, n_frames=12, hw=64)

    sync_wd = str(root / "syncnet")
    Trainer(SyncNetTask(_base(sync_wd, lrs3))).fit()

    a2m_wd = str(root / "a2m")
    Trainer(VAESyncAudio2MotionTask(_base(a2m_wd, lrs3, lambda_kl=0.5))).fit()

    pn_wd = str(root / "postnet")
    Trainer(
        PostnetAdvSyncTask(
            _base(
                pn_wd, None,
                lrs3_data_dir=lrs3, person_data_dir=lrs3,
                audio2motion_work_dir=a2m_wd, syncnet_work_dir=sync_wd,
                postnet_disc_start_steps=1, postnet_disc_interval=1,
                postnet_lambda_mse=0.05, postnet_lambda_adv=0.85,
                postnet_lambda_sync=0.1,
            )
        )
    ).fit()

    head_wd = str(root / "radnerf_head")
    Trainer(RADNeRFTask(tiny_cfg(synth, head_wd))).fit()
    return dict(root=str(root), lrs3=lrs3, synth=synth, sync_wd=sync_wd,
                a2m_wd=a2m_wd, pn_wd=pn_wd, head_wd=head_wd)


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(cfg_path, cwd):
    env = dict(
        os.environ, JAX_PLATFORMS="cpu",
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    r = subprocess.run(
        [sys.executable, "-m", "geneface_tpu.tasks.run",
         "--config", cfg_path, "--infer"],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, f"CLI failed:\n{r.stdout[-2000:]}\n{r.stderr[-4000:]}"
    return r


def test_two_cli_cascade(pipeline, tmp_path):
    root = pipeline["root"]
    # pre-extracted HuBERT features (the documented cache path; the live
    # HuBERT forward is weights-gated in this image)
    hubert = np.random.RandomState(0).randn(32, 1024).astype(np.float32)
    hubert_npy = str(tmp_path / "hubert.npy")
    np.save(hubert_npy, hubert)
    pred_npy = str(tmp_path / "pred_lm3d.npy")

    stage_a = {
        "task_cls": "geneface_tpu.tasks.postnet.PostnetAdvSyncTask",
        "work_dir": pipeline["pn_wd"],
        "audio2motion_work_dir": pipeline["a2m_wd"],
        "syncnet_work_dir": pipeline["sync_wd"],
        "infer_hubert_npy": hubert_npy,
        "infer_out_npy_name": pred_npy,
        "infer_temperature": 1.0,
        "seed": 0,
    }
    cfg_a = str(tmp_path / "postnet_infer.yaml")
    with open(cfg_a, "w") as f:
        yaml.safe_dump(stage_a, f)
    _run_cli(cfg_a, root)

    assert os.path.exists(pred_npy)
    pred = np.load(pred_npy)
    assert pred.shape == (1, 16, 68, 3) and np.all(np.isfinite(pred))

    # ---- stage B: radnerf CLI reads the stage-A npy via infer_cond_name
    out_mp4 = str(tmp_path / "out" / "cascade.mp4")
    cfg_b_dict = dict(tiny_cfg(pipeline["synth"], pipeline["head_wd"]))
    cfg_b_dict.update(
        task_cls="geneface_tpu.tasks.radnerf.RADNeRFTask",
        infer_cond_name=pred_npy,
        infer_out_video_name=out_mp4,
        infer_n_frames=4,
        infer_lm3d_clamp_std=2.5,
        infer_smooth_camera_path=False,
    )
    cfg_b = str(tmp_path / "radnerf_infer.yaml")
    with open(cfg_b, "w") as f:
        yaml.safe_dump(
            {k: (v.tolist() if hasattr(v, "tolist") else v)
             for k, v in cfg_b_dict.items()},
            f,
        )
    _run_cli(cfg_b, root)

    assert os.path.exists(out_mp4) and os.path.getsize(out_mp4) > 0
    import cv2

    cap = cv2.VideoCapture(out_mp4)
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame)
    cap.release()
    assert len(frames) == 4
    fr = np.stack(frames).astype(np.float32)
    assert np.all(np.isfinite(fr))
    # non-constant: the render actually drew scene content
    assert fr.std() > 1.0, f"mp4 frames look blank (std={fr.std():.3f})"
