"""End-to-end `--infer` CLI: train tiny vanilla/RAD NeRFs, then drive the
inference dispatch (``Task.start(infer=True)``) to an .mp4.

Covers VERDICT r1 gap: ``tasks.run --infer`` previously raised; now every
task family dispatches to its inference pipeline (reference
``inference/nerfs/base_nerf_infer.py:49-317``, ``lm3d_nerf_infer.py``,
``adnerf_infer.py``).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.make_synthetic_dataset import make_dataset  # noqa: E402

from geneface_tpu.config import Config  # noqa: E402
from geneface_tpu.training.trainer import Trainer  # noqa: E402


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("synth"))
    # >= 10 frames: the AD-NeRF attention smoother needs 8-frame windows
    make_dataset(d, n_frames=10, hw=32)
    return d


def vanilla_cfg(synth, work_dir, **over):
    cfg = Config(
        data_dir=synth, work_dir=work_dir,
        cond_type="idexp_lm3d_normalized", cond_win_size=1, smo_win_size=3,
        cond_dim=16, hidden_size=32, with_att=True,
        near=0.3, far=0.9, n_rays=64,
        n_samples_per_ray=4, n_samples_per_ray_fine=4,
        lr=5e-4, scheduler="exponential", seed=0,
        max_updates=2, val_check_interval=2, tb_log_interval=1,
        num_sanity_val_steps=0, eval_max_batches=1,
        no_smo_iterations=0, max_ray_batch=512,
    )
    cfg.update(over)
    return cfg


def test_lm3d_nerf_infer_cli(synth, tmp_path):
    from geneface_tpu.tasks.lm3d_nerf import Lm3dNeRFTask

    wd = str(tmp_path / "head")
    cfg = vanilla_cfg(synth, wd)
    Trainer(Lm3dNeRFTask(cfg)).fit()

    # stage-A stand-in: a predicted lm3d npy (raw idexp space)
    ds = np.load(os.path.join(synth, "trainval_dataset.npy"),
                 allow_pickle=True).tolist()
    mean = ds["idexp_lm3d_mean"]
    std = ds["idexp_lm3d_std"]
    T = 3
    pred = mean[None] + 0.1 * std[None] * np.random.RandomState(0).randn(
        T, 68, 3
    )
    npy = str(tmp_path / "pred_lm3d.npy")
    np.save(npy, pred[None].reshape(1, T, 204))

    out_mp4 = str(tmp_path / "out" / "pred.mp4")
    icfg = vanilla_cfg(
        synth, wd,
        infer=True, infer_cond_name=npy, infer_out_video_name=out_mp4,
        infer_lm3d_clamp_std=2.5, infer_lm3d_lle_percent=0.25,
        infer_inject_eye_blink_mode="gt", infer_lm3d_smooth_sigma=1.0,
        infer_n_frames=T,
    )
    path = Lm3dNeRFTask.start(icfg)
    assert os.path.exists(path) and os.path.getsize(path) > 0


def test_adnerf_infer_cli(synth, tmp_path):
    from geneface_tpu.tasks.lm3d_nerf import ADNeRFTask

    wd = str(tmp_path / "head")
    # the AD-NeRF attention smoother expects 8-frame windows (reference
    # modules/nerfs/adnerf/backbone.py AudioAttNet seq_len=8)
    cfg = vanilla_cfg(synth, wd, cond_type="deepspeech", smo_win_size=8)
    Trainer(ADNeRFTask(cfg)).fit()

    T = 2
    ds_npy = str(tmp_path / "deepspeech.npy")
    np.save(ds_npy, np.random.RandomState(0).randn(T, 16, 29).astype(np.float32))
    out_mp4 = str(tmp_path / "out" / "pred.mp4")
    icfg = vanilla_cfg(
        synth, wd, cond_type="deepspeech", smo_win_size=8,
        infer=True, infer_cond_name=ds_npy, infer_out_video_name=out_mp4,
        infer_n_frames=T,
    )
    path = ADNeRFTask.start(icfg)
    assert os.path.exists(path) and os.path.getsize(path) > 0


def test_radnerf_infer_cli_subprocess(synth, tmp_path):
    """The documented two-command flow through the real CLI module:
    train (2 steps) then ``--infer`` (reference README quick-start)."""
    import yaml

    wd = str(tmp_path / "exp")
    out_mp4 = str(tmp_path / "out" / "pred.mp4")
    cfg = dict(
        task_cls="geneface_tpu.tasks.radnerf.RADNeRFTask",
        data_dir=synth, work_dir=wd,
        cond_type="idexp_lm3d_normalized", cond_win_size=1, smo_win_size=3,
        cond_out_dim=16, with_att=True, bound=1, grid_type="tiledgrid",
        log2_hashmap_size=9, desired_resolution=128, grid_size=32,
        num_layers_ambient=2, hidden_dim_ambient=16, num_layers_sigma=2,
        hidden_dim_sigma=16, geo_feat_dim=16, num_layers_color=2,
        hidden_dim_color=16, individual_embedding_num=16,
        individual_embedding_dim=4, n_rays=64, max_steps=8,
        update_extra_interval=1000, density_thresh=10,
        dt_gamma=0.00390625, near=0.3, far=0.9, min_near=0.05,
        lr=5e-4, scheduler="exponential", finetune_lips=False, seed=0,
        max_updates=2, val_check_interval=2, tb_log_interval=1,
        num_sanity_val_steps=0, eval_max_batches=1,
        infer_out_video_name=out_mp4, infer_n_frames=2,
    )
    ycfg = str(tmp_path / "cfg.yaml")
    with open(ycfg, "w") as f:
        yaml.safe_dump(cfg, f)

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.join(os.path.dirname(__file__), ".."))
    run = [sys.executable, "-m", "geneface_tpu.tasks.run", "--config", ycfg]
    r = subprocess.run(run, env=env, capture_output=True, text=True,
                       timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    r = subprocess.run(run + ["--infer"], env=env, capture_output=True,
                       text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(out_mp4) and os.path.getsize(out_mp4) > 0
