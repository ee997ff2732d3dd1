"""Decompose RAD-NeRF train-step time on the real chip.

Times each stage of the hot path in isolation: march, field eval (grid +
MLPs), composite, full forward, forward+backward, full train step.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from geneface_tpu.config import Config
from geneface_tpu.tasks.radnerf import RADNeRFTask
from tools.make_synthetic_dataset import make_dataset


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t0) / n


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
    )
    task = RADNeRFTask(cfg)
    state = task.build()
    rng = jax.random.PRNGKey(0)
    batches = task.train_batches(0)
    batch = next(batches)
    # run a couple of real steps to populate the occupancy grid
    for _ in range(2):
        rng, k = jax.random.split(rng)
        state, losses = task.train_step(state, next(batches), k)
    jax.block_until_ready(losses["total_loss"])

    params, occ = state["params"], state["occ"]
    dbatch = task._device_batch(batch, 2)
    model = task.model

    frac = float(jnp.mean(occ.occ_grid))
    print(f"occ fraction: {frac:.4f}")

    # ---- expand batch once (outside timing)
    ebatch = jax.jit(lambda b: task._expand_light_batch(b))(dbatch)
    rays_o, rays_d = ebatch["rays_o"], ebatch["rays_d"]

    from geneface_tpu.models.radnerf.renderer import make_aabb
    from geneface_tpu.ops import near_far_from_aabb, march_rays_train, composite_rays

    aabb = make_aabb(1.0)

    @jax.jit
    def stage_march(rays_o, rays_d, occ_grid, rng):
        nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, 0.05)
        noises = jax.random.uniform(rng, (rays_o.shape[0],))
        return march_rays_train(
            rays_o, rays_d, occ_grid, nears, fars, noises,
            bound=1.0, dt_gamma=1.0 / 256, max_steps=16, cascade=1,
            grid_size=128,
        )
    t = timeit(stage_march, rays_o, rays_d, occ.occ_grid, rng)
    print(f"march:            {t*1e3:8.2f} ms")
    march = stage_march(rays_o, rays_d, occ.occ_grid, rng)
    print("  mean samples/ray:", float(march.valid.sum() / n_rays))

    cond_feat = model.apply(params, ebatch["cond_wins"], method=model.cal_cond_feat)
    ind = params["params"]["individual_embeddings"][0]
    M = n_rays * 16
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (M, 3), minval=-0.5, maxval=0.5)
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (M, 1))

    @jax.jit
    def stage_field(params, xyz, dirs, cond_feat, ind):
        return model.apply(params, xyz, dirs, cond_feat, ind)
    t = timeit(stage_field, params, xyz, dirs, cond_feat, ind)
    print(f"field fwd (1M):   {t*1e3:8.2f} ms")

    @jax.jit
    def stage_field_bwd(params, xyz, dirs, cond_feat, ind):
        def loss(p):
            s, rgb, amb = model.apply(p, xyz, dirs, cond_feat, ind)
            return jnp.sum(s) + jnp.sum(rgb) + jnp.sum(amb)
        return jax.grad(loss)(params)
    t = timeit(stage_field_bwd, params, xyz, dirs, cond_feat, ind)
    print(f"field fwd+bwd:    {t*1e3:8.2f} ms")

    # composite
    sig = jax.random.uniform(jax.random.PRNGKey(2), (n_rays, 16))
    rgbs = jax.random.uniform(jax.random.PRNGKey(3), (3, n_rays, 16))
    t = timeit(jax.jit(composite_rays), sig, rgbs, march.dts, march.depth_ts, march.valid)
    print(f"composite:        {t*1e3:8.2f} ms")

    # full loss fwd
    @jax.jit
    def stage_loss(params, occ, batch, rng):
        return task._loss_fn(params, occ, batch, rng, train=True)
    t = timeit(stage_loss, params, occ, dbatch, rng)
    print(f"loss fwd:         {t*1e3:8.2f} ms")

    @jax.jit
    def stage_grad(params, occ, batch, rng):
        return jax.grad(lambda p: task._loss_fn(p, occ, batch, rng, train=True)[0])(params)
    t = timeit(stage_grad, params, occ, dbatch, rng)
    print(f"loss fwd+bwd:     {t*1e3:8.2f} ms")

    # full train step (no donation for timing reuse)
    def full(state, batch, rng):
        return task._train_step_fn(
            state["params"], state["opt_state"], state["occ"], batch, rng
        )
    # donation prevents reuse; rebuild args each call — time loosely
    t0 = time.time()
    n = 10
    st = {k: state[k] for k in state}
    for i in range(n):
        p, o, losses = full({"params": st["params"], "opt_state": st["opt_state"], "occ": occ}, dbatch, rng)
        st = {"params": p, "opt_state": o, "occ": occ}
    jax.block_until_ready(losses["total_loss"])
    print(f"train step:       {(time.time()-t0)/n*1e3:8.2f} ms")

    # occupancy update
    cond0 = ebatch["cond_wins"]
    t = timeit(lambda p, o, c, r: task._occ_update_fn(p, jax.tree.map(jnp.array, o), c, r), params, occ, cond0, rng)
    print(f"occ update:       {t*1e3:8.2f} ms (every 16 steps)")


if __name__ == "__main__":
    main()
