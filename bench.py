"""Headline benchmark: RAD-NeRF head training throughput (rays/s/chip).

Runs the full jitted train step (occupancy-pruned ray march → grid+MLP field
→ composite → losses → backward → 3-group Adam) at the reference's production
shape: 65,536 rays/step, 128³ occupancy grid, ≤16 samples/ray
(``egs/egs_bases/radnerf/base.yaml``).

Baseline: the reference trains 250k steps in ~6h on an RTX 3090 Ti ⇒
~11.6 steps/s ⇒ ~0.76 M rays/s (BASELINE.md). ``vs_baseline`` is the
speedup of this chip over that number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_RAYS_PER_S = 0.76e6


def main():
    import jax
    import numpy as np

    from geneface_tpu.config import Config
    from geneface_tpu.tasks.radnerf import RADNeRFTask
    from tools.make_synthetic_dataset import make_dataset

    tmp = tempfile.mkdtemp(prefix="gf_bench_")
    make_dataset(tmp, n_frames=8, hw=512)

    n_rays = 65536
    cfg = Config(
        data_dir=tmp,
        work_dir=os.path.join(tmp, "work"),
        cond_type="idexp_lm3d_normalized",
        cond_win_size=1,
        smo_win_size=5,
        cond_out_dim=64,
        with_att=True,
        bound=1,
        grid_type="tiledgrid",
        log2_hashmap_size=16,
        desired_resolution=2048,
        grid_size=128,
        num_layers_ambient=3,
        hidden_dim_ambient=128,
        num_layers_sigma=3,
        hidden_dim_sigma=128,
        geo_feat_dim=128,
        num_layers_color=2,
        hidden_dim_color=128,
        individual_embedding_num=13000,
        individual_embedding_dim=4,
        n_rays=n_rays,
        max_steps=16,
        update_extra_interval=16,
        density_thresh=10,
        dt_gamma=1.0 / 256,
        near=0.3,
        far=0.9,
        min_near=0.05,
        lr=5e-4,
        scheduler="exponential",
        finetune_lips=False,
        lambda_weights_entropy=1e-4,
        lambda_ambient=0.1,
        seed=0,
    )

    task = RADNeRFTask(cfg)
    state = task.build()
    rng = jax.random.PRNGKey(0)
    batches = task.train_batches(0)

    # Realistic occupancy: at bench time the model is untrained, so its own
    # density sweep would mark ~everything (or nothing) occupied. A trained
    # face grid is a sparse blob; emulate it analytically from the synthetic
    # scene's true geometry (ball of r~0.11 + dilation margin), with density
    # values high enough that the periodic EMA updates inside the timed loop
    # keep it stable. Yields ~4-6 valid samples/ray at 512^2 — the same
    # regime the reference trains in after its grid converges.
    import jax.numpy as jnp
    from geneface_tpu.models.radnerf.renderer import OccupancyState

    H = cfg["grid_size"]
    r = (np.arange(H) + 0.5) / H * 2.0 - 1.0
    gx, gy, gz = np.meshgrid(r, r, r, indexing="ij")
    dist = np.sqrt(gx**2 + gy**2 + gz**2)
    occ_np = dist < (0.13 + 4.0 / H)
    density = np.where(occ_np, 4.0 * cfg["density_thresh"], 0.0).reshape(1, -1)
    state["occ"] = OccupancyState(
        density_grid=jnp.asarray(density, jnp.float32),
        occ_grid=jnp.asarray(occ_np[None]),
        mean_density=jnp.asarray(0.0, jnp.float32),
    )

    # warmup: occupancy update + step compile
    for _ in range(3):
        rng, k = jax.random.split(rng)
        state, losses = task.train_step(state, next(batches), k)
    jax.block_until_ready(losses["total_loss"])

    # chained timing: the tunnel's D2H roundtrip is ~28 ms, so block once at
    # the end — steps serialize on-device through the donated train state
    n_steps = 30
    t0 = time.time()
    for _ in range(n_steps):
        rng, k = jax.random.split(rng)
        state, losses = task.train_step(state, next(batches), k)
    jax.block_until_ready(losses["total_loss"])
    dt = (time.time() - t0) / n_steps

    rays_per_s = n_rays / dt
    print(
        json.dumps(
            {
                "metric": "radnerf_head_train_rays_per_s",
                "value": round(rays_per_s, 1),
                "unit": "rays/s/chip",
                "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
