"""End-to-end vanilla lm3d NeRF training on synthetic data (BASELINE cfg[0])."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.make_synthetic_dataset import make_dataset  # noqa: E402

from geneface_tpu.config import Config  # noqa: E402
from geneface_tpu.tasks.lm3d_nerf import Lm3dNeRFTask  # noqa: E402
from geneface_tpu.training.trainer import Trainer  # noqa: E402


def test_lm3d_nerf_trains(tmp_path):
    synth = str(tmp_path / "synth")
    make_dataset(synth, n_frames=10, hw=48)
    wd = str(tmp_path / "work")
    cfg = Config(
        data_dir=synth,
        work_dir=wd,
        cond_type="idexp_lm3d_normalized",
        cond_win_size=1,
        smo_win_size=3,
        cond_dim=16,
        hidden_size=32,
        with_att=True,
        use_window_cond=True,
        no_smo_iterations=4,  # att warm start kicks in mid-test
        n_rays=128,
        in_rect_percent=0.9,
        n_samples_per_ray=8,
        n_samples_per_ray_fine=8,
        near=0.3,
        far=0.9,
        lr=5e-3,
        scheduler="exponential",
        max_updates=8,
        val_check_interval=4,
        tb_log_interval=2,
        num_sanity_val_steps=1,
        eval_max_batches=1,
        seed=0,
    )
    Trainer(Lm3dNeRFTask(cfg)).fit()
    lines = [json.loads(l) for l in open(os.path.join(wd, "metrics.jsonl"))]
    tr = [l for l in lines if "tr/mse_loss" in l]
    assert tr and np.isfinite(tr[-1]["tr/mse_loss"])
    assert any("tr/mse_loss_coarse" in l for l in lines)
    ckpts = [f for f in os.listdir(wd) if f.startswith("model_ckpt_steps")]
    assert ckpts
