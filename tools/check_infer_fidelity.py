"""Fidelity of the truncated-capacity 512^2 inference path.

The FPS bench renders through the lattice march + compacted field eval with
a per-ray sample budget (``mean_samples_per_ray``). Overflow beyond the
capacity drops tail samples/rays (``ops/compaction.make_compact_plan``), so
a too-small budget renders the end of the frame as background. This tool
renders the SAME bench scene (dense-ball occupancy, production model)
through the full-slab while-loop walk (no compaction: the semantic
reference, ``renderer.py`` mean_samples_per_ray=None path) and through the
lattice+compact path at several budgets, and reports PSNR / max|diff| of
each against the full-slab render, plus frame times.

Reference semantics anchor: the CUDA infer loop evaluates every marched
sample until T<T_thresh (``raymarching.cu:828-1020``); the full-slab walk
matches it, so PSNR against it measures exactly what truncation costs.
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
    from bench import production_cfg, run_infer_phase, trained_grid_occ  # noqa: F401
    from bench import bench_infer_fps
    from tools.make_synthetic_dataset import make_dataset
    from geneface_tpu.data.radnerf_dataset import RADNeRFDataset, get_cond_window
    from geneface_tpu.tasks.radnerf import model_from_cfg
    from geneface_tpu.models.radnerf.renderer import (
        occupied_aabb,
        render_rays_radnerf,
    )
    from geneface_tpu.ops import near_far_from_aabb
    from geneface_tpu.utils.camera import get_rays

    tmp_ctx = tempfile.TemporaryDirectory(prefix="gf_fid_")
    tmp = tmp_ctx.name
    hw = int(os.environ.get("GF_FID_HW", 512))
    make_dataset(tmp, n_frames=4, hw=hw)
    cfg = production_cfg(tmp)
    model = model_from_cfg(cfg)
    ds = RADNeRFDataset("train", tmp, cfg, training=True)
    cond0 = jnp.asarray(get_cond_window(ds.conds, 0, cfg["smo_win_size"]))
    params = model.init(
        jax.random.PRNGKey(0), cond0, jnp.zeros((8, 3)), jnp.zeros((8, 3)),
        method=model.init_all,
    )
    occ = trained_grid_occ(cfg)

    rays = get_rays(ds.poses[0], ds.intrinsics, hw, hw)
    rays_o = jnp.asarray(rays["rays_o"])
    rays_d = jnp.asarray(rays["rays_d"])
    bg = jnp.asarray(ds.bg_img.reshape(-1, 3))
    cond = cond0

    tight = occupied_aabb(occ.occ_grid, float(cfg["bound"]))
    tn, _ = near_far_from_aabb(rays_o, rays_d, tight, cfg["min_near"])
    n_hit = int(jax.device_get((tn < 1e30).sum()))
    from geneface_tpu.inference.radnerf_infer import pick_ray_capacity
    cap = pick_ray_capacity(n_hit, hw * hw)
    print(f"rays hitting tight box: {n_hit} / {hw*hw}  -> ray capacity {cap}")

    from geneface_tpu.models.radnerf.renderer import kdop_hit, occupied_kdop

    kdop = jax.tree_util.tree_map(
        jnp.asarray, occupied_kdop(occ.occ_grid, float(cfg["bound"]))
    )
    n_hit_k = int(jax.device_get(
        kdop_hit(rays_o, rays_d, kdop, float(cfg["min_near"])).sum()
    ))
    cap_k = pick_ray_capacity(n_hit_k, hw * hw)
    print(f"kdop hits: {n_hit_k} -> capacity {cap_k}")

    # density_scale emulates a CONVERGED checkpoint's opacity: the random-
    # init field's sigmas are tiny, so transmittance never decays and every
    # marched sample carries weight — the worst case for budget truncation,
    # and unrepresentative of trained faces (whose surfaces saturate T
    # within a few samples; the reference's real-time alive-ray loop relies
    # on exactly that early-out, raymarching.cu:943-1020). Applied to the
    # full-slab reference render identically, so PSNR stays apples-to-apples.
    DENSITY_SCALE = float(os.environ.get("GF_FID_DENSITY_SCALE", 0))

    def make_render(mspr, latk, use_kdop=False):
        @jax.jit
        def render(params, occ, cond, rays_o, rays_d, bg):
            cond_feat = model.apply(params, cond, method=model.cal_cond_feat)
            ind = params["params"]["individual_embeddings"][0]

            def field_fn(xyz, dirs):
                return model.apply(params, xyz, dirs, cond_feat, ind)

            out = render_rays_radnerf(
                field_fn, rays_o, rays_d, occ, bg_color=bg,
                bound=float(cfg["bound"]), min_near=float(cfg["min_near"]),
                dt_gamma=float(cfg["dt_gamma"]), max_steps=int(cfg["max_steps"]),
                grid_size=int(cfg["grid_size"]),
                mean_samples_per_ray=mspr,
                ray_capacity=cap_k if use_kdop else cap,
                lattice_K=latk,
                march_paired=True,
                cull_kdop=kdop if use_kdop else None,
                density_scale=DENSITY_SCALE or 1.0,
            )
            return out["rgb_map"]

        return render

    def run(tag, mspr, latk, n_time=10, use_kdop=False):
        r = make_render(mspr, latk, use_kdop)
        t0 = time.time()
        img = r(params, occ, cond, rays_o, rays_d, bg)
        jax.block_until_ready(img)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(n_time):
            img = r(params, occ, cond, rays_o, rays_d, bg)
        jax.block_until_ready(img)
        dt = (time.time() - t0) / n_time
        print(f"{tag:28s} {dt*1e3:7.1f} ms/frame ({1/dt:5.2f} FPS, "
              f"compile {compile_s:.0f}s)")
        return np.asarray(jax.device_get(img)), dt

    ref_img, _ = run("full-slab walk (reference)", None, None, n_time=3)

    def report(img):
        d = img - ref_img
        mse = float(np.mean(d * d))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        print(f"    vs reference: PSNR {psnr:6.2f} dB, "
              f"max|diff| {np.abs(d).max():.4f}")

    if not int(os.environ.get("GF_FID_ONLY_BF16", 0)):
        for mspr in (8.0, 6.0, 5.0, 4.0):
            img, dt = run(f"lattice+compact mspr={mspr}", mspr, 48)
            report(img)

    # bf16 grid compute at inference: same f32 params, wide encoder tensors
    # in bf16 (compute-only — no training/convergence concern here)
    cfg["grid_compute_dtype"] = "bf16"
    model = model_from_cfg(cfg)
    img, dt = run("lattice mspr=6 grid bf16", 6.0, 48)
    report(img)

    # round-5 production path: kdop cull (smaller ray capacity) + bf16 +
    # waterfilled sample budget
    for mspr in (6.0, 5.0, 4.0):
        img, dt = run(f"kdop+bf16 mspr={mspr}", mspr, 48, use_kdop=True)
        report(img)


if __name__ == "__main__":
    main()
