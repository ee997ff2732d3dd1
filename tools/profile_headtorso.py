"""Decompose the 512² HEAD+TORSO inference frame time on the real chip.

Round-5 headline work (VERDICT #1): the reference's real-time claim is the
head+torso composite (``inference/nerfs/radnerf_gui.py:81``,
``modules/radnerfs/radnerf_torso.py:86-199``); the bench previously measured
head-only.

Timing: chained dispatch (queue ``iters`` executions, block once) — the
fori_loop differencing harness (tools/tpu_timeit.py) SIGILLs the TPU
compiler's priority-fusion pass when the torso field is in the loop body,
and frames chain device-side in production anyway.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def planted_torso_occ(grid_size: int):
    """Lower-half-of-screen torso occupancy (the bust regime: torso fills
    roughly the bottom 45% of the frame in the May data)."""
    from geneface_tpu.models.radnerf.renderer import TorsoOccupancyState

    H = grid_size
    r = (np.arange(H) + 0.5) / H * 2.0 - 1.0
    gy, gx = np.meshgrid(r, r, indexing="ij")  # stored [y, x]
    occ = (gy > 0.1).astype(np.float32)
    return TorsoOccupancyState(
        density_grid=jnp.asarray(occ.reshape(-1)),
        mean_density=jnp.asarray(0.0, jnp.float32),
    )


def chain_time(fn, *args, iters=20, repeats=3):
    """Wall seconds/call with ``iters`` chained dispatches, blocked once."""
    jitted = jax.jit(fn)
    out = jitted(*args)
    jax.block_until_ready(out)
    best = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jitted(*args)
        jax.block_until_ready(out)
        best.append((time.perf_counter() - t0) / iters)
    best.sort()
    return best[len(best) // 2]


def main():
    from bench import production_cfg, trained_grid_occ
    from geneface_tpu.data.radnerf_dataset import RADNeRFDataset, get_cond_window
    from geneface_tpu.inference.radnerf_infer import pick_ray_capacity
    from geneface_tpu.models.radnerf import RADNeRFTorso
    from geneface_tpu.models.radnerf.renderer import (
        kdop_hit,
        occupied_aabb,
        occupied_kdop,
        render_rays_radnerf,
        render_rays_radnerf_torso,
    )
    from geneface_tpu.ops import near_far_from_aabb
    from geneface_tpu.tasks.radnerf import model_from_cfg
    from geneface_tpu.utils.camera import get_bg_coords, get_rays
    from tools.make_synthetic_dataset import make_dataset

    hw = int(os.environ.get("GF_HW", 512))
    mspr = float(os.environ.get("GF_INFER_MSPR", 5))
    mspr6 = float(os.environ.get("GF_INFER_MSPR2", 6))
    K = int(os.environ.get("GF_INFER_LATK", 48))
    with tempfile.TemporaryDirectory(prefix="gf_pht_") as tmp:
        make_dataset(tmp, n_frames=4, hw=hw)
        cfg = production_cfg(tmp)
        cfg["grid_compute_dtype"] = os.environ.get("GF_GRID_DTYPE", "bf16")
        model = model_from_cfg(
            cfg, RADNeRFTorso,
            torso_shrink=0.8, torso_individual_embedding_dim=8,
            torso_head_aware=False,
        )
        ds = RADNeRFDataset("train", tmp, cfg, training=True)
        cond = jnp.asarray(get_cond_window(ds.conds, 0, cfg["smo_win_size"]))
        params = model.init(
            jax.random.PRNGKey(0), cond, jnp.zeros((8, 3)), jnp.zeros((8, 3)),
            method=model.init_all,
        )
        occ = trained_grid_occ(cfg)
        torso_occ = planted_torso_occ(int(cfg["grid_size"]))
        rays = get_rays(ds.poses[0], ds.intrinsics, hw, hw)
        rays_o = jnp.asarray(rays["rays_o"])
        rays_d = jnp.asarray(rays["rays_d"])
        bg = jnp.asarray(ds.bg_img.reshape(-1, 3))
        bg_coords = jnp.asarray(get_bg_coords(hw, hw)[0])  # [H*W, 2]
        pose6 = jnp.asarray(ds.poses6[0:1])

        bound = float(cfg["bound"])
        min_near = float(cfg["min_near"])
        tight = occupied_aabb(occ.occ_grid, bound)
        tn, _ = near_far_from_aabb(rays_o, rays_d, tight, min_near)
        n_hit = int(jax.device_get((tn < 1e30).sum()))
        cap = pick_ray_capacity(n_hit, hw * hw)
        kdop = jax.tree_util.tree_map(
            jnp.asarray, occupied_kdop(occ.occ_grid, bound)
        )
        n_hit_k = int(jax.device_get(
            kdop_hit(rays_o, rays_d, kdop, min_near).sum()
        ))
        cap_k = pick_ray_capacity(n_hit_k, hw * hw)
        print(f"AABB hit {n_hit} -> cap {cap}; "
              f"kdop hit {n_hit_k} -> cap {cap_k}", flush=True)

        cond_feat = model.apply(params, cond, method=model.cal_cond_feat)
        ind = params["params"]["individual_embeddings"][0]
        t_ind = params["params"]["torso_individual_codes"][0]

        def field_fn(x, d):
            return model.apply(params, x, d, cond_feat, ind)

        def torso_fn(xy, head_img, head_ws):
            return model.apply(
                params, xy, pose6, t_ind, head_img, head_ws,
                method=model.forward_torso,
            )

        base_kwargs = dict(
            bound=bound, min_near=min_near, dt_gamma=float(cfg["dt_gamma"]),
            max_steps=int(cfg["max_steps"]), grid_size=int(cfg["grid_size"]),
            lattice_K=K, march_paired=True,
        )

        def t(name, fn, *args, iters=20):
            dt = chain_time(fn, *args, iters=iters)
            print(f"{name:42s} {dt*1e3:8.2f} ms", flush=True)

        def head_aabb(ro):
            out = render_rays_radnerf(
                field_fn, ro, rays_d, occ, bg_color=bg,
                mean_samples_per_ray=mspr, ray_capacity=cap, **base_kwargs
            )
            return out["rgb_map"]
        t("head frame (AABB cull, mspr5)", head_aabb, rays_o)

        def head_kdop(ro):
            out = render_rays_radnerf(
                field_fn, ro, rays_d, occ, bg_color=bg,
                mean_samples_per_ray=mspr6, ray_capacity=cap_k,
                cull_kdop=kdop, **base_kwargs
            )
            return out["rgb_map"]
        t("head frame (kdop cull, mspr6)", head_kdop, rays_o)

        def torso_full(xy):
            a, c, _dx = torso_fn(
                xy, jnp.zeros((hw * hw, 3)), jnp.zeros((hw * hw, 1))
            )
            return a * c
        t(f"torso field ({hw*hw//1000}k px)", torso_full, bg_coords)

        from geneface_tpu.models.radnerf.radnerf_torso import (
            sample_torso_occupancy,
        )
        occ_samp = sample_torso_occupancy(
            torso_occ.density_grid, bg_coords, int(cfg["grid_size"])
        )
        n_t = int(jax.device_get((occ_samp > 0.01).sum()))
        tcap = pick_ray_capacity(n_t, hw * hw) or hw * hw
        print(f"torso-occupied px {n_t} -> capacity {tcap}")

        def torso_culled(xy):
            samp = sample_torso_occupancy(
                torso_occ.density_grid, xy, int(cfg["grid_size"])
            )
            (idx,) = jnp.nonzero(samp > 0.01, size=tcap, fill_value=hw * hw)
            sel = jnp.minimum(idx, hw * hw - 1)
            a, c, _dx = torso_fn(
                jnp.take(xy, sel, axis=0), jnp.zeros((tcap, 3)),
                jnp.zeros((tcap, 1)),
            )
            packed = jnp.concatenate([a, c], axis=-1)
            return jnp.zeros((hw * hw, 4)).at[idx].set(packed, mode="drop")
        t(f"torso field culled ({tcap//1000}k px)", torso_culled, bg_coords)

        def headtorso(ro):
            out = render_rays_radnerf_torso(
                field_fn, torso_fn, ro, rays_d, bg_coords, occ, torso_occ,
                density_thresh_torso=0.01, bg_color=bg,
                mean_samples_per_ray=mspr6, ray_capacity=cap_k,
                cull_kdop=kdop, **base_kwargs
            )
            return out["rgb_map"]
        t("HEAD+TORSO frame (kdop, mspr6)", headtorso, rays_o)


if __name__ == "__main__":
    main()
