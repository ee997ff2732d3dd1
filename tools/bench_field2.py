"""Focused ablation of the RAD-NeRF field backward cost (3 jits only)."""

import sys, time
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from geneface_tpu.models.radnerf import RADNeRF
from geneface_tpu.ops.encoders import block_grid_encode, build_block_tables


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    model = RADNeRF(
        cond_out_dim=64, cond_win_size=1, smo_win_size=5,
        log2_hashmap_size=16, desired_resolution=2048,
        hidden_dim_ambient=128, hidden_dim_sigma=128, geo_feat_dim=128,
        hidden_dim_color=128, individual_embedding_num=13000,
        individual_embedding_dim=4,
    )
    rng = jax.random.PRNGKey(0)
    cond = jnp.zeros((5, 1, 204))
    params = model.init(
        rng, cond, jnp.zeros((8, 3)), jnp.zeros((8, 3)), method=model.init_all
    )
    cond_feat = model.apply(params, cond, method=model.cal_cond_feat)
    ind = params["params"]["individual_embeddings"][0]

    M = 1 << 20
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (M, 3), minval=-0.5, maxval=0.5)
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (M, 1))

    def loss(p):
        s, rgb, amb = model.apply(p, xyz, dirs, cond_feat, ind)
        return jnp.sum(s) + jnp.sum(rgb) + jnp.sum(amb)

    # a) grads w.r.t. the two grid tables only
    @jax.jit
    def grad_grids(p):
        sub = {k: p["params"][k] for k in ("pos_embeddings", "ambient_embeddings")}

        def f(sub):
            merged = dict(p["params"]); merged.update(sub)
            return loss({"params": merged})

        return jax.grad(f)(sub)

    t = timeit(grad_grids, params)
    print(f"a) grad grids only:       {t*1e3:8.2f} ms", flush=True)

    # b) grads w.r.t. the MLPs only
    @jax.jit
    def grad_mlps(p):
        keys = [k for k in p["params"]
                if k not in ("pos_embeddings", "ambient_embeddings")]
        sub = {k: p["params"][k] for k in keys}

        def f(sub):
            merged = dict(p["params"]); merged.update(sub)
            return loss({"params": merged})

        return jax.grad(f)(sub)

    t = timeit(grad_mlps, params)
    print(f"b) grad MLPs only:        {t*1e3:8.2f} ms", flush=True)

    # c) grad w.r.t. a PREBUILT block table (bypasses build_block_tables bwd)
    bmeta = model.pos_block_meta if hasattr(model, "pos_block_meta") else None
    from geneface_tpu.ops.encoders import make_block_grid_meta, make_grid_meta
    meta = make_grid_meta(
        input_dim=3, num_levels=16, level_dim=2, base_resolution=16,
        log2_hashmap_size=16, desired_resolution=2048, gridtype="tiled",
    )
    bmeta = make_block_grid_meta(meta)
    tables = build_block_tables(params["params"]["pos_embeddings"], bmeta)
    x01 = (xyz + 1.0) / 2.0

    @jax.jit
    def grad_tables(tables):
        return jax.grad(lambda t: jnp.sum(block_grid_encode(x01, t, bmeta)))(tables)

    t = timeit(grad_tables, tables)
    print(f"c) grad prebuilt tables:  {t*1e3:8.2f} ms", flush=True)

    # d) build_block_tables fwd+bwd alone
    @jax.jit
    def grad_build(emb):
        return jax.grad(
            lambda e: jnp.sum(build_block_tables(e, bmeta).astype(jnp.float32))
        )(emb)

    t = timeit(grad_build, params["params"]["pos_embeddings"])
    print(f"d) build_tables fwd+bwd:  {t*1e3:8.2f} ms", flush=True)

    # e) encode fwd alone on prebuilt tables
    @jax.jit
    def enc(tables):
        return block_grid_encode(x01, tables, bmeta)

    t = timeit(enc, tables)
    print(f"e) encode fwd (1 grid):   {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
