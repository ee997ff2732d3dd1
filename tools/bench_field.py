"""Dissect the RAD-NeRF field fwd+bwd cost on TPU.

Times gradients w.r.t. isolated parameter groups and ablated submodules to
find where the 600ms backward goes.
"""

import sys, time
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from geneface_tpu.models.radnerf import RADNeRF


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

    @jax.jit
    def full_grad(p):
        return jax.grad(loss)(p)

    t = timeit(full_grad, params)
    print(f"grad all params:      {t*1e3:8.2f} ms")

    # gradient w.r.t. a single leaf subset, everything else stopped
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = sorted({path[1].key for path in [p for p, _ in flat] if len(path) > 1})
    top = params["params"]

    def grad_only(keys):
        keys = set(keys)

        @jax.jit
        def g(p):
            def loss_sub(sub):
                merged = dict(p["params"])
                merged.update(sub)
                return loss({"params": merged})

            sub = {k: p["params"][k] for k in keys if k in p["params"]}
            return jax.grad(loss_sub)(sub)

        return timeit(g, params)

    for k in top.keys():
        t = grad_only([k])
        print(f"grad {k:24s}: {t*1e3:8.2f} ms")

    # forward only in bf16 vs fp32
    @jax.jit
    def fwd(p):
        return model.apply(p, xyz, dirs, cond_feat, ind)

    t = timeit(fwd, params)
    print(f"fwd fp32:             {t*1e3:8.2f} ms")

    pb = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )
    xb = xyz.astype(jnp.bfloat16)
    db = dirs.astype(jnp.bfloat16)

    @jax.jit
    def fwd_b(p):
        return model.apply(p, xb, db, cond_feat.astype(jnp.bfloat16),
                           ind.astype(jnp.bfloat16))

    try:
        t = timeit(fwd_b, pb)
        print(f"fwd bf16 params:      {t*1e3:8.2f} ms")
    except Exception as e:
        print("bf16 fwd failed:", str(e)[:200])


if __name__ == "__main__":
    main()
