"""Decompose RAD-NeRF train-step time on the real chip.

Times each stage of the hot path in isolation using the on-device loop
harness (``tools/tpu_timeit.py`` — per-call ``block_until_ready`` timings
through the TPU tunnel carry a ~28 ms roundtrip and are unreliable).
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from geneface_tpu.config import Config
from geneface_tpu.tasks.radnerf import RADNeRFTask
from tools.make_synthetic_dataset import make_dataset
from tools.tpu_timeit import device_time


def main():
    tmp = tempfile.mkdtemp(prefix="gf_prof_")
    make_dataset(tmp, n_frames=8, hw=512)
    n_rays = 65536
    cfg = Config(
        data_dir=tmp, work_dir=os.path.join(tmp, "work"),
        cond_type="idexp_lm3d_normalized", cond_win_size=1, smo_win_size=5,
        cond_out_dim=64, with_att=True, bound=1, grid_type="tiledgrid",
        log2_hashmap_size=16, desired_resolution=2048, grid_size=128,
        num_layers_ambient=3, hidden_dim_ambient=128, num_layers_sigma=3,
        hidden_dim_sigma=128, geo_feat_dim=128, num_layers_color=2,
        hidden_dim_color=128, individual_embedding_num=13000,
        individual_embedding_dim=4, n_rays=n_rays, max_steps=16,
        update_extra_interval=16, density_thresh=10, dt_gamma=1.0 / 256,
        near=0.3, far=0.9, min_near=0.05, lr=5e-4, scheduler="exponential",
        finetune_lips=False, lambda_weights_entropy=1e-4, lambda_ambient=0.1,
        seed=0,
        mean_samples_per_ray=float(os.environ.get("GF_MEAN_SPR", 8)),
        fused_single_table=bool(int(os.environ.get("GF_SINGLE_TABLE", 0))),
        grid_compute_dtype=os.environ.get("GF_GRID_DTYPE", "f32"),
        grid_bwd_dtype=os.environ.get("GF_GRID_BWD_DTYPE", "same"),
    )
    task = RADNeRFTask(cfg)
    state = task.build()
    rng = jax.random.PRNGKey(0)
    batches = task.train_batches(0)
    batch = next(batches)

    # Analytic occupancy (same recipe as bench.py) instead of warmup train
    # steps: skips the ~10 min full-step compile so single-stage runs
    # (GF_STAGE=march etc.) start timing immediately.
    import numpy as np

    from geneface_tpu.models.radnerf.renderer import OccupancyState

    Hg = cfg["grid_size"]
    r = (np.arange(Hg) + 0.5) / Hg * 2.0 - 1.0
    gx, gy, gz = np.meshgrid(r, r, r, indexing="ij")
    occ_np = np.sqrt(gx**2 + gy**2 + gz**2) < (
        float(os.environ.get("GF_OCC_R", 0.6)) + 4.0 / Hg
    )
    density = np.where(occ_np, 4.0 * cfg["density_thresh"], 0.0).reshape(1, -1)
    state["occ"] = OccupancyState(
        density_grid=jnp.asarray(density, jnp.float32),
        occ_grid=jnp.asarray(occ_np[None]),
        mean_density=jnp.asarray(0.0, jnp.float32),
    )

    params, occ = state["params"], state["occ"]
    STAGE = os.environ.get("GF_STAGE", "all")

    stages = STAGE.split(",")

    def want(name):
        return name in stages or "all" in stages
    dbatch = task._device_batch(batch, 2)
    model = task.model

    print(f"occ fraction: {float(jnp.mean(occ.occ_grid)):.4f}", flush=True)

    ebatch = jax.jit(lambda b: task._expand_light_batch(b))(dbatch)
    rays_o, rays_d = ebatch["rays_o"], ebatch["rays_d"]

    from geneface_tpu.models.radnerf.renderer import make_aabb
    from geneface_tpu.ops import near_far_from_aabb, march_rays_train, composite_rays

    aabb = make_aabb(1.0)

    if want('march'):
        def stage_march(i, rays_o, rays_d, occ_grid):
            ro = rays_o * (1.0 + i.astype(jnp.float32) * 1e-12)
            nears, fars = near_far_from_aabb(ro, rays_d, aabb, 0.05)
            noises = jnp.zeros((ro.shape[0],))
            return march_rays_train(
                ro, rays_d, occ_grid, nears, fars, noises,
                bound=1.0, dt_gamma=1.0 / 256, max_steps=16, cascade=1,
                grid_size=128,
            )
        t = device_time(stage_march, rays_o, rays_d, occ.occ_grid, iters=5)
        print(f"march:            {t*1e3:8.2f} ms", flush=True)
        nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, 0.05)
        march = jax.jit(lambda: march_rays_train(
            rays_o, rays_d, occ.occ_grid, nears, fars, jnp.zeros((n_rays,)),
            bound=1.0, dt_gamma=1.0 / 256, max_steps=16, cascade=1, grid_size=128,
        ))()
        print("  mean samples/ray:", float(march.valid.sum() / n_rays), flush=True)

    if want('pack'):
        from geneface_tpu.ops import pack_occ_blocks

        def stage_pack(i, og):
            g = og ^ (i % 2 == 1)
            return pack_occ_blocks(g[0])
        t = device_time(stage_pack, occ.occ_grid, iters=5)
        print(f"pack_occ_blocks:  {t*1e3:8.2f} ms", flush=True)

    if want('march_lattice'):
        from geneface_tpu.ops import lattice_span_cells, march_rays_lattice

        nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, 0.05)
        span = int(lattice_span_cells(
            rays_o, rays_d, occ.occ_grid, nears, fars,
            bound=1.0, grid_size=128, max_steps=16,
        ))
        K = int(os.environ.get("GF_LATK", 0)) or span + 2
        print(f"  lattice span={span} -> K={K}", flush=True)

        def stage_latt(i, rays_o, rays_d, occ_grid):
            ro = rays_o * (1.0 + i.astype(jnp.float32) * 1e-12)
            nears, fars = near_far_from_aabb(ro, rays_d, aabb, 0.05)
            noises = jnp.zeros((ro.shape[0],))
            return march_rays_lattice(
                ro, rays_d, occ_grid, nears, fars, noises,
                bound=1.0, dt_gamma=1.0 / 256, max_steps=16, cascade=1,
                grid_size=128, lattice_K=K,
            )
        t = device_time(stage_latt, rays_o, rays_d, occ.occ_grid, iters=5)
        print(f"march (lattice):  {t*1e3:8.2f} ms", flush=True)

    cond_feat = model.apply(params, ebatch["cond_wins"], method=model.cal_cond_feat)
    ind = params["params"]["individual_embeddings"][0]
    spr = float(cfg.get("mean_samples_per_ray", 8))
    M = int(n_rays * spr) if spr else n_rays * 16
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (M, 3), minval=-0.5, maxval=0.5)
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (M, 1))

    if want('grid') or want('grid_bwd'):
        # position grid encode in isolation, current backend
        from geneface_tpu.ops.fused_grid import fused_grid_encode

        x01 = (xyz + 1.0) / 2.0
        gp = params["params"]["pos_embeddings"]
        fmeta = model.pos_fused_meta if hasattr(model, "pos_fused_meta") else None
        # flax: access meta via a bound module
        bound = model.bind(params)
        fmeta = bound.pos_fused_meta

        if want('grid'):
            def stage_grid(i, gp, x01):
                x = x01 * (1.0 + i.astype(jnp.float32) * 1e-12)
                return fused_grid_encode(x, gp, fmeta)
            t = device_time(stage_grid, gp, x01, iters=5)
            print(f"grid fwd ({M//1000}k): {t*1e3:8.2f} ms", flush=True)

        if want('grid_bwd'):
            def stage_grid_bwd(i, gp, x01):
                x = x01 * (1.0 + i.astype(jnp.float32) * 1e-12)
                def loss(p, xx):
                    return jnp.sum(fused_grid_encode(xx, p, fmeta))
                return jax.grad(loss, argnums=(0, 1))(gp, x)
            t = device_time(stage_grid_bwd, gp, x01, iters=5)
            print(f"grid fwd+bwd:     {t*1e3:8.2f} ms", flush=True)

    if want('mlp'):
        # the three field MLPs on synthetic features (no grid encoders)
        import flax.linen as fnn

        class MLPs(fnn.Module):
            @fnn.compact
            def __call__(self, pos_feat, amb_feat, cond, sh, ind):
                from geneface_tpu.models.radnerf.cond_encoder import MLP as GMLP
                amb = GMLP(dim_out=2, dim_hidden=128, num_layers=3, dtype=jnp.bfloat16)(
                    jnp.concatenate([pos_feat, cond], -1))
                h = GMLP(dim_out=129, dim_hidden=128, num_layers=3, dtype=jnp.bfloat16)(
                    jnp.concatenate([pos_feat, amb_feat], -1))
                col = GMLP(dim_out=3, dim_hidden=128, num_layers=2, dtype=jnp.bfloat16)(
                    jnp.concatenate([sh, h[:, 1:], ind], -1))
                return h, col, amb

        W = 32
        pos_feat = jax.random.normal(jax.random.PRNGKey(5), (M, W))
        amb_feat = jax.random.normal(jax.random.PRNGKey(6), (M, W))
        condr = jnp.zeros((M, 64))
        sh = jnp.zeros((M, 16))
        indr = jnp.zeros((M, 4))
        mlps = MLPs()
        mp = mlps.init(jax.random.PRNGKey(7), pos_feat, amb_feat, condr, sh, indr)

        def stage_mlp(i, mp, pos_feat):
            pf = pos_feat * (1.0 + i.astype(jnp.float32) * 1e-12)
            return mlps.apply(mp, pf, amb_feat, condr, sh, indr)
        t = device_time(stage_mlp, mp, pos_feat, iters=5)
        print(f"mlps fwd ({M//1000}k): {t*1e3:8.2f} ms", flush=True)

        def stage_mlp_bwd(i, mp, pos_feat):
            pf = pos_feat * (1.0 + i.astype(jnp.float32) * 1e-12)
            def loss(p):
                h, col, amb = mlps.apply(p, pf, amb_feat, condr, sh, indr)
                return (jnp.sum(h.astype(jnp.float32)) + jnp.sum(col.astype(jnp.float32))
                        + jnp.sum(amb.astype(jnp.float32)))
            return jax.grad(loss)(mp)
        t = device_time(stage_mlp_bwd, mp, pos_feat, iters=5)
        print(f"mlps fwd+bwd:     {t*1e3:8.2f} ms", flush=True)

    if want('ambpos'):
        def stage_ambpos(i, params, xyz, cond_feat):
            x = xyz * (1.0 + i.astype(jnp.float32) * 1e-12)
            return model.apply(
                params, x, cond_feat, method=model._ambient_and_pos
            )
        t = device_time(stage_ambpos, params, xyz, cond_feat, iters=5)
        print(f"ambient+pos fwd:  {t*1e3:8.2f} ms", flush=True)

    if want('posenc'):
        bound = model.bind(params)
        from geneface_tpu.ops.fused_grid import fused_grid_encode
        x01 = (xyz + 1.0) / 2.0
        gp = params["params"]["pos_embeddings"]

        def stage_posenc(i, gp, x01):
            x = x01 * (1.0 + i.astype(jnp.float32) * 1e-12)
            return fused_grid_encode(x, gp, bound.pos_fused_meta)
        t = device_time(stage_posenc, gp, x01, iters=5)
        print(f"pos encode fwd:   {t*1e3:8.2f} ms", flush=True)

        ga = params["params"]["ambient_embeddings"]
        amb01 = jax.random.uniform(jax.random.PRNGKey(9), (M, 2))

        def stage_ambenc(i, ga, amb01):
            x = amb01 * (1.0 + i.astype(jnp.float32) * 1e-12)
            return fused_grid_encode(x, ga, bound.ambient_fused_meta)
        t = device_time(stage_ambenc, ga, amb01, iters=5)
        print(f"amb encode fwd:   {t*1e3:8.2f} ms", flush=True)

    if want('ambconst'):
        bound = model.bind(params)
        from geneface_tpu.ops.fused_grid import fused_grid_encode
        ga = params["params"]["ambient_embeddings"]

        def stage_ambconst(i, ga):
            x = jnp.full((M, 2), 0.5) * (1.0 + i.astype(jnp.float32) * 1e-9)
            return fused_grid_encode(x, ga, bound.ambient_fused_meta)
        t = device_time(stage_ambconst, ga, iters=5)
        print(f"amb encode const: {t*1e3:8.2f} ms", flush=True)

    if want('mlptanh'):
        def stage_mlptanh(i, params, xyz, cond_feat):
            x = xyz * (1.0 + i.astype(jnp.float32) * 1e-12)
            # pos encode + ambient MLP + tanh, skipping the second encode
            b = model.bind(params)
            x01 = (x + b.bound) / (2 * b.bound)
            from geneface_tpu.ops.fused_grid import fused_grid_encode
            pos_feat = fused_grid_encode(
                x01, params["params"]["pos_embeddings"], b.pos_fused_meta, False
            )
            cond_rep = jnp.broadcast_to(
                cond_feat.reshape(1, -1), (x.shape[0], cond_feat.shape[-1])
            )
            amb = model.apply(
                params,
                jnp.concatenate([pos_feat, cond_rep], axis=-1),
                method=lambda m, h: m.ambient_net(h),
            )
            if isinstance(amb, tuple):  # round-4 split-head column outputs
                amb = jnp.stack(amb, axis=-1)
            return jnp.tanh(amb.astype(jnp.float32))
        t = device_time(stage_mlptanh, params, xyz, cond_feat, iters=5)
        print(f"pos+mlp+tanh fwd: {t*1e3:8.2f} ms", flush=True)

    if want('barrier'):
        from geneface_tpu.ops.fused_grid import fused_grid_encode
        bound = model.bind(params)
        x01 = (xyz + 1.0) / 2.0
        gp = params["params"]["pos_embeddings"]
        Wd = jax.random.normal(jax.random.PRNGKey(11), (96, 128), jnp.bfloat16)
        cond_rep = jnp.zeros((M, 64))

        def stage_nobar(i, gp, x01, cond_rep, Wd):
            x = x01 * (1.0 + i.astype(jnp.float32) * 1e-12)
            pf = fused_grid_encode(x, gp, bound.pos_fused_meta, False)
            h = jnp.concatenate([pf, cond_rep], -1).astype(jnp.bfloat16)
            return h @ Wd
        t = device_time(stage_nobar, gp, x01, cond_rep, Wd, iters=5)
        print(f"enc->matmul:      {t*1e3:8.2f} ms", flush=True)

        def stage_bar(i, gp, x01, cond_rep, Wd):
            x = x01 * (1.0 + i.astype(jnp.float32) * 1e-12)
            pf = fused_grid_encode(x, gp, bound.pos_fused_meta, False)
            pf = jax.lax.optimization_barrier(pf)
            h = jnp.concatenate([pf, cond_rep], -1).astype(jnp.bfloat16)
            return h @ Wd
        t = device_time(stage_bar, gp, x01, cond_rep, Wd, iters=5)
        print(f"enc-|bar|->matmul:{t*1e3:8.2f} ms", flush=True)

    if want('field'):
        def stage_field(i, params, xyz, dirs, cond_feat, ind):
            x = xyz * (1.0 + i.astype(jnp.float32) * 1e-12)
            return model.apply(params, x, dirs, cond_feat, ind)
        t = device_time(stage_field, params, xyz, dirs, cond_feat, ind, iters=5)
        print(f"field fwd ({M//1000}k): {t*1e3:8.2f} ms", flush=True)

    if want('field_bwd'):
        def stage_field_bwd(i, params, xyz, dirs, cond_feat, ind):
            x = xyz * (1.0 + i.astype(jnp.float32) * 1e-12)
            def loss(p):
                s, rgb, amb = model.apply(p, x, dirs, cond_feat, ind)
                return jnp.sum(s) + jnp.sum(rgb) + jnp.sum(amb)
            return jax.grad(loss)(params)
        t = device_time(stage_field_bwd, params, xyz, dirs, cond_feat, ind, iters=5)
        print(f"field fwd+bwd:    {t*1e3:8.2f} ms", flush=True)

    if want('comp'):
        _dts = jnp.full((n_rays, 16), 1e-2)
        _dpts = jnp.cumsum(_dts, axis=-1)
        _valid = jnp.arange(16)[None, :] < 6
        _valid = jnp.broadcast_to(_valid, (n_rays, 16))

        def stage_comp(i, sig, rgbs):
            s = sig * (1.0 + i.astype(jnp.float32) * 1e-12)
            return composite_rays(s, rgbs, _dts, _dpts, _valid)
        sig = jax.random.uniform(jax.random.PRNGKey(2), (n_rays, 16))
        rgbs = jax.random.uniform(jax.random.PRNGKey(3), (3, n_rays, 16))
        t = device_time(stage_comp, sig, rgbs, iters=5)
        print(f"composite:        {t*1e3:8.2f} ms", flush=True)

    def _perturbed(i):
        # perturb a real input so XLA cannot hoist the body out of the
        # timing loop (pose feeds rays -> march -> field -> everything)
        b = dict(dbatch)
        b["pose_matrix"] = b["pose_matrix"] * (1.0 + i.astype(jnp.float32) * 1e-12)
        return b

    if want('loss'):
        def stage_loss(i, params, occ, rng):
            return task._loss_fn(params, occ, _perturbed(i), rng, train=True)[0]
        t = device_time(stage_loss, params, occ, rng, iters=5)
        print(f"loss fwd:         {t*1e3:8.2f} ms", flush=True)

    if want('grad'):
        def stage_grad(i, params, occ, rng):
            return jax.grad(
                lambda p: task._loss_fn(p, occ, _perturbed(i), rng, train=True)[0]
            )(params)
        t = device_time(stage_grad, params, occ, rng, iters=5)
        print(f"loss fwd+bwd:     {t*1e3:8.2f} ms", flush=True)

    # full train step: chain N donated steps, block once at the end
    if want('occ'):
        def stage_occ(i, params, occ_dg, occ_og, occ_md, cond0, rng):
            from geneface_tpu.models.radnerf.renderer import OccupancyState
            o = OccupancyState(occ_dg * (1.0 + i.astype(jnp.float32) * 1e-12), occ_og, occ_md)
            return task._occ_update_fn(params, o, cond0, rng)
        t = device_time(
            stage_occ, params, occ.density_grid, occ.occ_grid, occ.mean_density,
            ebatch["cond_wins"], rng, iters=3,
        )
        print(f"occ update:       {t*1e3:8.2f} ms (every 16 steps)", flush=True)

    # full train step: chain N donated steps, block once at the end.
    # NOTE: donates params/opt_state — run last.
    if want('step'):
        def full(state, batch, rng):
            return task._train_step_fn(
                state["params"], state["opt_state"], state["occ"], batch, rng
            )
        p, o, losses = full(
            {"params": state["params"], "opt_state": state["opt_state"], "occ": occ},
            dbatch, rng,
        )
        jax.block_until_ready(losses["total_loss"])
        n = 20
        t0 = time.time()
        for _ in range(n):
            p, o, losses = full({"params": p, "opt_state": o, "occ": occ}, dbatch, rng)
        jax.block_until_ready(losses["total_loss"])
        print(f"train step:       {(time.time()-t0)/n*1e3:8.2f} ms", flush=True)
        # same but with a single pre-staged device batch (isolates per-step H2D)
        t0 = time.time()
        for _ in range(n):
            p, o, losses = full({"params": p, "opt_state": o, "occ": occ}, dbatch, rng)
        jax.block_until_ready(losses["total_loss"])
        print(f"train step (hot): {(time.time()-t0)/n*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
