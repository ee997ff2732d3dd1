"""Head → torso two-stage training on synthetic data."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.make_synthetic_dataset import make_dataset  # noqa: E402

from geneface_tpu.tasks.radnerf import RADNeRFTask  # noqa: E402
from geneface_tpu.tasks.radnerf_torso import RADNeRFTorsoTask  # noqa: E402
from geneface_tpu.training.trainer import Trainer  # noqa: E402
from tests.test_radnerf_training import tiny_cfg  # noqa: E402


def test_torso_warm_starts_from_head(tmp_path):
    synth = str(tmp_path / "synth")
    make_dataset(synth, n_frames=10, hw=64)

    head_wd = str(tmp_path / "head")
    cfg = tiny_cfg(synth, head_wd, max_updates=4, val_check_interval=4)
    Trainer(RADNeRFTask(cfg)).fit()

    torso_wd = str(tmp_path / "torso")
    tcfg = tiny_cfg(
        synth, torso_wd, max_updates=4, val_check_interval=4,
        head_model_dir=head_wd,
        torso_individual_embedding_dim=8,
        density_thresh_torso=0.01,
        torso_shrink=0.8,
        torso_train_mode=1,
    )
    task = RADNeRFTorsoTask(tcfg)
    trainer = Trainer(task)
    state = trainer.fit()

    # head params were loaded and frozen: compare against head ckpt
    from geneface_tpu.utils import get_last_checkpoint, load_checkpoint

    head_ckpt = load_checkpoint(get_last_checkpoint(head_wd))
    head_sig = head_ckpt["state"]["params"]["params"]["sigma_net"]
    torso_sig = state["params"]["params"]["sigma_net"]

    def first_leaf(d):
        while isinstance(d, dict):
            d = next(iter(d.values()))
        return np.asarray(d)

    np.testing.assert_allclose(first_leaf(torso_sig), first_leaf(head_sig))
    # torso occupancy got populated
    assert float(state["torso_occ"].mean_density) > 0
    # metrics exist
    import json

    lines = [json.loads(l) for l in open(os.path.join(torso_wd, "metrics.jsonl"))]
    assert any("tr/torso_mse_loss" in l for l in lines)
