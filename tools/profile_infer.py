"""Decompose the 512² inference frame time on the real chip.

Stages: ray cull, lattice march (gather/select split), record
materialization + compact plan, field eval at the inference capacity,
composite+scatter-back, and the full frame.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from tools.tpu_timeit import device_time


def main():
    from bench import production_cfg, trained_grid_occ
    from geneface_tpu.data.radnerf_dataset import RADNeRFDataset, get_cond_window
    from geneface_tpu.inference.radnerf_infer import pick_ray_capacity
    from geneface_tpu.models.radnerf.renderer import (
        occupied_aabb,
        render_rays_radnerf,
    )
    from geneface_tpu.ops import (
        march_rays_lattice,
        near_far_from_aabb,
        pack_occ_blocks,
    )
    from geneface_tpu.ops.compaction import compact_gather, make_compact_plan
    from geneface_tpu.tasks.radnerf import model_from_cfg
    from geneface_tpu.utils.camera import get_rays
    from tools.make_synthetic_dataset import make_dataset

    hw = int(os.environ.get("GF_HW", 512))
    with tempfile.TemporaryDirectory(prefix="gf_pinf_") as tmp:
        make_dataset(tmp, n_frames=4, hw=hw)
        cfg = production_cfg(tmp)
        cfg["grid_compute_dtype"] = os.environ.get("GF_GRID_DTYPE", "bf16")
        model = model_from_cfg(cfg)
        ds = RADNeRFDataset("train", tmp, cfg, training=True)
        cond = jnp.asarray(get_cond_window(ds.conds, 0, cfg["smo_win_size"]))
        params = model.init(
            jax.random.PRNGKey(0), cond, jnp.zeros((8, 3)), jnp.zeros((8, 3)),
            method=model.init_all,
        )
        occ = trained_grid_occ(cfg)
        rays = get_rays(ds.poses[0], ds.intrinsics, hw, hw)
        rays_o_f = jnp.asarray(rays["rays_o"])
        rays_d_f = jnp.asarray(rays["rays_d"])
        bg = jnp.asarray(ds.bg_img.reshape(-1, 3))

        bound = float(cfg["bound"])
        min_near = float(cfg["min_near"])
        tight = occupied_aabb(occ.occ_grid, bound)
        tn, _ = near_far_from_aabb(rays_o_f, rays_d_f, tight, min_near)
        n_hit = int(jax.device_get((tn < 1e30).sum()))
        cap = pick_ray_capacity(n_hit, hw * hw)
        print(f"hit {n_hit}/{hw*hw} -> ray capacity {cap}")
        (idx,) = jnp.nonzero(tn < 1e30, size=cap, fill_value=hw * hw)
        sel = jnp.minimum(idx, hw * hw - 1)
        rays_o = jnp.take(rays_o_f, sel, axis=0)
        rays_d = jnp.take(rays_d_f, sel, axis=0)
        N = cap
        K = int(cfg.get("lattice_K", 48))
        mspr = 6.0
        sample_cap = min(int(-(-N * mspr // 1024) * 1024), N * K)
        print(f"march N={N} K={K} -> {N*K/1e6:.1f}M lattice points; "
              f"field capacity {sample_cap/1e6:.2f}M")

        def t(name, fn, *args, iters=5):
            dt = device_time(fn, *args, iters=iters)
            print(f"{name:32s} {dt*1e3:8.2f} ms", flush=True)

        nears, fars = near_far_from_aabb(
            rays_o, rays_d, jnp.asarray([-1, -0.5, -1, 1, 0.5, 1.0]), min_near
        )
        noises = jnp.zeros((N,))

        def stage_cull(i, ro, rd):
            ro = ro * (1 + i.astype(jnp.float32) * 1e-12)
            tn, _ = near_far_from_aabb(ro, rd, tight, min_near)
            (ix,) = jnp.nonzero(tn < 1e30, size=cap, fill_value=hw * hw)
            s = jnp.minimum(ix, hw * hw - 1)
            return jnp.take(ro, s, axis=0), jnp.take(rd, s, axis=0)

        t("cull+gather rays", stage_cull, rays_o_f, rays_d_f)

        def stage_march(i, ro, rd, og):
            ro = ro * (1 + i.astype(jnp.float32) * 1e-12)
            nr, fr = near_far_from_aabb(
                ro, rd, jnp.asarray([-1, -0.5, -1, 1, 0.5, 1.0]), min_near
            )
            return march_rays_lattice(
                ro, rd, og, nr, fr, noises, bound=bound,
                dt_gamma=float(cfg["dt_gamma"]), max_steps=int(cfg["max_steps"]),
                cascade=1, grid_size=int(cfg["grid_size"]), lattice_K=K,
            )
        t("march (lattice)", stage_march, rays_o, rays_d, occ.occ_grid)

        march = jax.jit(lambda: march_rays_lattice(
            rays_o, rays_d, occ.occ_grid, nears, fars, noises, bound=bound,
            dt_gamma=float(cfg["dt_gamma"]), max_steps=int(cfg["max_steps"]),
            cascade=1, grid_size=int(cfg["grid_size"]), lattice_K=K,
        ))()
        print("  mean samples/ray:", float(march.valid.sum()) / N,
              " span:", int(march.span))

        def stage_plan(i, valid):
            v = valid ^ (i % 2 == 1)
            return make_compact_plan(v, sample_cap)
        t("compact plan", stage_plan, march.valid)

        plan = make_compact_plan(march.valid, sample_cap)

        def stage_rec(i, ro, rd, ts, dts, dpts):
            ro = ro * (1 + i.astype(jnp.float32) * 1e-12)
            ro_b = ro[:, None, :]
            rd_b = rd[:, None, :]
            xyz_slab = ro_b + ts[..., None] * rd_b
            rec = jnp.concatenate(
                [dts[..., None], dpts[..., None], xyz_slab,
                 jnp.broadcast_to(rd_b, xyz_slab.shape)], axis=-1)
            return compact_gather(plan, rec)
        t("record + compact gather", stage_rec, rays_o, rays_d, march.ts,
          march.dts, march.depth_ts)

        # field eval at the inference capacity
        cond_feat = model.apply(params, cond, method=model.cal_cond_feat)
        ind = params["params"]["individual_embeddings"][0]
        xyz = jax.random.uniform(jax.random.PRNGKey(1), (sample_cap, 3),
                                 minval=-0.5, maxval=0.5)
        dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (sample_cap, 1))

        def stage_field(i, params, xyz):
            x = xyz * (1 + i.astype(jnp.float32) * 1e-12)
            return model.apply(params, x, dirs, cond_feat, ind)
        t(f"field fwd ({sample_cap//1000}k)", stage_field, params, xyz)

        # full frame through the production renderer
        @jax.jit
        def frame(params, occ, cond, ro, rd, bg):
            cf = model.apply(params, cond, method=model.cal_cond_feat)

            def field_fn(x, d):
                return model.apply(params, x, d, cf, ind)

            out = render_rays_radnerf(
                field_fn, ro, rd, occ, bg_color=bg, bound=bound,
                min_near=min_near, dt_gamma=float(cfg["dt_gamma"]),
                max_steps=int(cfg["max_steps"]), grid_size=int(cfg["grid_size"]),
                mean_samples_per_ray=mspr, ray_capacity=cap, lattice_K=K,
            )
            return out["rgb_map"]

        def stage_frame(i, params, ro):
            ro = ro * (1 + i.astype(jnp.float32) * 1e-12)
            return frame(params, occ, cond, ro, rays_d_f, bg)
        t("FULL FRAME", stage_frame, params, rays_o_f, iters=5)


if __name__ == "__main__":
    main()
