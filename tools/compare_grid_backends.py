"""Convergence comparison of the grid-encoder backends.

Trains the same synthetic scene under ``grid_backend`` in {fused, block,
reference} (plus ``fused_single`` = fused with single_table) with identical
seeds/steps and reports the full-frame val PSNR of each — the quality
evidence for the TPU-tuned default (the fused backend's grouped coarse
levels alias at the finest-in-group block granularity; this measures what
that trade costs on an actual scene).

Usage: python tools/compare_grid_backends.py [--steps 1500] [--hw 256]
       [--backends fused,block,reference] [--seed N]
Backend-name suffixes compose onto ``fused``: ``_ugN`` (ungroup the N
coarsest levels, both grids), ``_posugN`` (pos grid only), ``_runN``
(ungrouped levels in runs of N), ``_rl128`` (row_lanes 128),
``_ambsingle``, ``_bf16``/``_mixed``/``_gbwd`` (dtypes) — e.g.
``fused_ug4``, ``fused_ug4_run2``. Round-5 frontier results:
docs/perf_notes.md "grid-backend quality/cost frontier".
Prints one JSON line per backend and a markdown table at the end.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def train_one(backend: str, data_dir: str, steps: int, n_rays: int, seed: int):
    import jax
    import numpy as np

    from geneface_tpu.config import Config
    from geneface_tpu.tasks.radnerf import RADNeRFTask

    single = backend.startswith("fused_single")
    bf16 = backend.endswith("_bf16")
    mixed = backend.endswith("_mixed")
    base = backend.replace("_bf16", "").replace("_mixed", "")
    row_lanes = 128 if "_rl128" in base else 256
    base = base.replace("_rl128", "")
    amb_single = "_ambsingle" in base
    base = base.replace("_ambsingle", "")
    ungroup = 0
    amb_ungroup = -1
    run = 1
    if "_run" in base:  # e.g. fused_ug4_run2 -> coarse levels in runs of 2
        base, _, tail = base.partition("_run")
        run = int(tail or 1)
    if "_posug" in base:  # fused_posug2 -> ungroup POS grid only
        base, _, tail = base.partition("_posug")
        ungroup = int(tail or 0)
        amb_ungroup = 0
    elif "_ug" in base:  # e.g. fused_ug2 -> ungroup the 2 coarsest levels
        base, _, tail = base.partition("_ug")
        ungroup = int(tail or 0)
    gbwd = "_gbwd" in base  # bf16 grid BACKWARD intermediates (round 5)
    base = base.replace("_gbwd", "")
    cfg = Config(
        data_dir=data_dir,
        work_dir=os.path.join(data_dir, f"work_{backend}"),
        cond_type="idexp_lm3d_normalized", cond_win_size=1, smo_win_size=5,
        cond_out_dim=64, with_att=True, bound=1, grid_type="tiledgrid",
        log2_hashmap_size=16, desired_resolution=2048, grid_size=128,
        num_layers_ambient=3, hidden_dim_ambient=128, num_layers_sigma=3,
        hidden_dim_sigma=128, geo_feat_dim=128, num_layers_color=2,
        hidden_dim_color=128, individual_embedding_num=13000,
        individual_embedding_dim=4, n_rays=n_rays, max_steps=16,
        update_extra_interval=16, density_thresh=10, dt_gamma=1.0 / 256,
        min_near=0.05, lr=5e-4, scheduler="exponential",
        finetune_lips=False, lambda_weights_entropy=1e-4, lambda_ambient=0.1,
        seed=seed,
        grid_backend="fused" if single else base,
        fused_single_table=single,
        fused_row_lanes=row_lanes,
        ambient_single_table=amb_single,
        fused_ungroup_coarse=ungroup,
        ambient_ungroup_coarse=amb_ungroup,
        fused_coarse_run=run,
        grid_compute_dtype="bf16" if bf16 else ("mixed" if mixed else "f32"),
        grid_bwd_dtype="bf16" if gbwd else "same",
    )
    task = RADNeRFTask(cfg)
    state = task.build()
    rng = jax.random.PRNGKey(seed)
    batches = task.train_batches(0)
    t0 = time.time()
    for i in range(steps):
        rng, k = jax.random.split(rng)
        state, losses = task.train_step(state, next(batches), k)
        if (i + 1) % max(1, steps // 5) == 0:
            print(
                f"#   {backend} step {i+1}/{steps}: "
                f"psnr {float(losses['head_psnr']):.2f}",
                file=sys.stderr, flush=True,
            )
    jax.block_until_ready(losses["total_loss"])
    wall = time.time() - t0

    img, gt = task.render_full_frame(state)
    mse = float(np.mean((img - gt) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    return {
        "backend": backend,
        "steps": steps,
        "full_frame_psnr": round(psnr, 3),
        "train_s": round(wall, 1),
        "ms_per_step": round(wall / steps * 1e3, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--n-rays", type=int, default=16384)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--backends",
        default="fused,fused_single,fused_single_bf16,block,reference",
    )
    args = ap.parse_args()

    from tools.make_synthetic_dataset import make_dataset

    tmp = tempfile.mkdtemp(prefix="gf_cmp_")
    make_dataset(tmp, n_frames=args.frames, hw=args.hw)

    rows = []
    for backend in args.backends.split(","):
        r = train_one(backend, tmp, args.steps, args.n_rays, args.seed)
        rows.append(r)
        print(json.dumps(r), flush=True)

    print("\n| backend | PSNR (dB) | ms/step |")
    print("|---|---|---|")
    for r in rows:
        print(
            f"| {r['backend']} | {r['full_frame_psnr']} | {r['ms_per_step']} |"
        )


if __name__ == "__main__":
    main()
