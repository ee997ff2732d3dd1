"""Does the (random-init) LPIPS lip phase help? Train the synthetic scene
with the lip finetune ON vs OFF, same seed/steps, and report full-frame and
lip-rect PSNR.

The reference's lip phase (tasks/radnerfs/radnerf.py:139-170) uses RELEASED
AlexNet-LPIPS weights; this image ships none, so the in-repo LPIPS falls
back to random conv features. This study measures whether that fallback
helps or hurts the lip region — the evidence behind the weights-gating
policy in tasks/radnerf.py.

Usage: python tools/lpips_lip_study.py [--steps 1200] [--lip-start 400]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_one(lips: bool, data_dir: str, steps: int, lip_start: int, seed: int):
    import jax
    import numpy as np

    from geneface_tpu.config import Config
    from geneface_tpu.tasks.radnerf import RADNeRFTask

    cfg = Config(
        data_dir=data_dir,
        work_dir=os.path.join(data_dir, f"work_lips{int(lips)}"),
        cond_type="idexp_lm3d_normalized", cond_win_size=1, smo_win_size=5,
        cond_out_dim=64, with_att=True, bound=1, grid_type="tiledgrid",
        log2_hashmap_size=16, desired_resolution=2048, grid_size=128,
        num_layers_ambient=3, hidden_dim_ambient=128, num_layers_sigma=3,
        hidden_dim_sigma=128, geo_feat_dim=128, num_layers_color=2,
        hidden_dim_color=128, individual_embedding_num=13000,
        individual_embedding_dim=4, n_rays=16384, max_steps=16,
        update_extra_interval=16, density_thresh=10, dt_gamma=1.0 / 256,
        min_near=0.05, lr=5e-4, scheduler="exponential",
        lambda_weights_entropy=1e-4, lambda_ambient=0.1, seed=seed,
        finetune_lips=lips,
        finetune_lips_start_iter=lip_start,
        allow_random_lpips=True,
    )
    task = RADNeRFTask(cfg)
    state = task.build()
    rng = jax.random.PRNGKey(seed)
    batches = task.train_batches(0)
    t0 = time.time()
    for i in range(steps):
        rng, k = jax.random.split(rng)
        state, losses = task.train_step(state, next(batches), k)
    jax.block_until_ready(losses["total_loss"])
    wall = time.time() - t0

    img, gt = task.render_full_frame(state)
    mse = float(np.mean((img - gt) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    # lip rect of frame 0 (xmin/xmax/ymin/ymax, dataset_utils.py:101-118)
    xmin, xmax, ymin, ymax = [int(v) for v in task.train_ds.lips_rects[0]]
    H = task.train_ds.H
    img2 = img.reshape(H, -1, 3)
    gt2 = gt.reshape(H, -1, 3)
    lip_mse = float(
        np.mean((img2[ymin:ymax, xmin:xmax] - gt2[ymin:ymax, xmin:xmax]) ** 2)
    )
    lip_psnr = -10.0 * np.log10(max(lip_mse, 1e-12))
    return {
        "finetune_lips": lips,
        "steps": steps,
        "full_frame_psnr": round(psnr, 3),
        "lip_rect_psnr": round(lip_psnr, 3),
        "ms_per_step": round(wall / steps * 1e3, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--lip-start", type=int, default=400)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from tools.make_synthetic_dataset import make_dataset

    tmp = tempfile.mkdtemp(prefix="gf_lips_")
    make_dataset(tmp, n_frames=16, hw=args.hw)
    for lips in (False, True):
        r = run_one(lips, tmp, args.steps, args.lip_start, args.seed)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
