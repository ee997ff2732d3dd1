"""Inference throughput: full-frame RAD-NeRF head renders at 512x512.

Reference points (BASELINE.md): RAD-NeRF inference is "real-time" (~25 FPS
target on a consumer GPU); vanilla NeRF manages ~0.035 FPS on a 2080 Ti.
Prints frames/s on this chip with the trained-grid occupancy emulation used
by bench.py.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from geneface_tpu.config import Config
    from geneface_tpu.models.radnerf.renderer import OccupancyState
    from geneface_tpu.tasks.radnerf import RADNeRFTask
    from tools.make_synthetic_dataset import make_dataset

    tmp = tempfile.mkdtemp(prefix="gf_fps_")
    hw = 512
    make_dataset(tmp, n_frames=4, hw=hw)
    cfg = Config(
        data_dir=tmp, work_dir=os.path.join(tmp, "work"),
        cond_type="idexp_lm3d_normalized", cond_win_size=1, smo_win_size=5,
        cond_out_dim=64, with_att=True, bound=1, grid_type="tiledgrid",
        log2_hashmap_size=16, desired_resolution=2048, grid_size=128,
        num_layers_ambient=3, hidden_dim_ambient=128, num_layers_sigma=3,
        hidden_dim_sigma=128, geo_feat_dim=128, num_layers_color=2,
        hidden_dim_color=128, individual_embedding_num=13000,
        individual_embedding_dim=4, n_rays=65536, max_steps=16,
        update_extra_interval=16, density_thresh=10, dt_gamma=1.0 / 256,
        near=0.3, far=0.9, min_near=0.05, lr=5e-4, scheduler="exponential",
        finetune_lips=False, seed=0,
    )
    task = RADNeRFTask(cfg)
    state = task.build()

    # trained-grid emulation (see bench.py): sparse face-sized blob
    H = cfg["grid_size"]
    r = (np.arange(H) + 0.5) / H * 2.0 - 1.0
    gx, gy, gz = np.meshgrid(r, r, r, indexing="ij")
    occ_np = np.sqrt(gx**2 + gy**2 + gz**2) < (0.13 + 4.0 / H)
    density = np.where(occ_np, 4.0 * cfg["density_thresh"], 0.0).reshape(1, -1)
    occ = OccupancyState(
        density_grid=jnp.asarray(density, jnp.float32),
        occ_grid=jnp.asarray(occ_np[None]),
        mean_density=jnp.asarray(0.0, jnp.float32),
    )

    from geneface_tpu.models.radnerf.renderer import render_rays_radnerf
    from geneface_tpu.utils.camera import get_rays

    ds = task.train_ds
    params = state["params"]
    model = task.model

    rays = get_rays(ds.poses[0], ds.intrinsics, hw, hw)  # full frame
    rays_o = jnp.asarray(rays["rays_o"])
    rays_d = jnp.asarray(rays["rays_d"])
    bg = jnp.asarray(ds.bg_img.reshape(-1, 3))
    from geneface_tpu.data.radnerf_dataset import get_cond_window

    cond = jnp.asarray(get_cond_window(ds.conds, 0, cfg["smo_win_size"]))

    @jax.jit
    def render(params, occ, cond, rays_o, rays_d, bg):
        cond_feat = model.apply(params, cond, method=model.cal_cond_feat)
        ind = params["params"]["individual_embeddings"][0]

        def field_fn(xyz, dirs):
            return model.apply(params, xyz, dirs, cond_feat, ind)

        out = render_rays_radnerf(
            field_fn, rays_o, rays_d, occ, bg_color=bg,
            bound=1.0, min_near=0.05, dt_gamma=1.0 / 256, max_steps=16,
            grid_size=H,
            mean_samples_per_ray=float(os.environ.get("GF_INFER_MSPR", 8)),
        )
        return out["rgb_map"]

    img = render(params, occ, cond, rays_o, rays_d, bg)
    jax.block_until_ready(img)
    n = 20
    t0 = time.time()
    for i in range(n):
        img = render(params, occ, cond, rays_o, rays_d, bg)
    jax.block_until_ready(img)
    dt = (time.time() - t0) / n
    print(
        f"radnerf head inference: {1.0/dt:.2f} FPS @ {hw}x{hw} "
        f"({dt*1e3:.1f} ms/frame, {hw*hw/dt/1e6:.2f} M rays/s)"
    )


if __name__ == "__main__":
    main()
