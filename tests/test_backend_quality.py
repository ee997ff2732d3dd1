"""Fused-backend quality: grouped-level aliasing must not cost meaningful
PSNR vs the per-level block backend on a real (small) scene.

The fused default changes model semantics (coarse levels alias at the
finest-in-group block granularity, ``ops/fused_grid.py``); this trains the
same scene under both backends with identical seeds/steps and bounds the
gap. The full-scale comparison lives in ``tools/compare_grid_backends.py``
(TPU; table committed in docs/perf_notes.md).
"""

import os
import sys
import tempfile

import jax
import numpy as np
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from geneface_tpu.config import Config  # noqa: E402
from geneface_tpu.tasks.radnerf import RADNeRFTask  # noqa: E402


def _train_psnr(backend: str, data_dir: str, steps: int = 200) -> float:
    cfg = Config(
        data_dir=data_dir,
        work_dir=os.path.join(data_dir, f"work_{backend}"),
        cond_type="idexp_lm3d_normalized", cond_win_size=1, smo_win_size=5,
        cond_out_dim=64, with_att=True, bound=1, grid_type="tiledgrid",
        log2_hashmap_size=14, desired_resolution=512, grid_size=64,
        num_layers_ambient=2, hidden_dim_ambient=64, num_layers_sigma=2,
        hidden_dim_sigma=64, geo_feat_dim=64, num_layers_color=2,
        hidden_dim_color=64, individual_embedding_num=100,
        individual_embedding_dim=4, n_rays=1024, max_steps=16,
        update_extra_interval=8, density_thresh=10, dt_gamma=1.0 / 256,
        min_near=0.05, lr=2e-3, scheduler="exponential",
        finetune_lips=False, lambda_weights_entropy=1e-4,
        lambda_ambient=0.1, seed=0, grid_backend=backend,
    )
    task = RADNeRFTask(cfg)
    state = task.build()
    rng = jax.random.PRNGKey(0)
    batches = task.train_batches(0)
    for _ in range(steps):
        rng, k = jax.random.split(rng)
        state, losses = task.train_step(state, next(batches), k)
    img, gt = task.render_full_frame(state)
    mse = float(np.mean((img - gt) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))


def test_fused_backend_psnr_parity(tmp_path):
    from tools.make_synthetic_dataset import make_dataset

    data = str(tmp_path / "scene")
    make_dataset(data, n_frames=8, hw=64)
    psnr_block = _train_psnr("block", data)
    psnr_fused = _train_psnr("fused", data)
    # fused trades quality for speed; the multi-seed study
    # (docs/perf_notes.md) measures it 3.3 dB below block on average with
    # ~2 dB seed noise — the parity bar here is "no collapse" (the rejected
    # single-table variants lose 15-20 dB), not equality
    assert psnr_fused > psnr_block - 6.0, (
        f"fused {psnr_fused:.2f} dB vs block {psnr_block:.2f} dB"
    )
    # both must actually have learned the scene
    assert psnr_block > 15.0 and psnr_fused > 15.0
