"""Stop-gradient ablation of the field backward (fast compiles).

Each variant stop-gradients one piece inside the full fwd+bwd; the time drop
attributes cost. Variant is selected by argv[1]:
  full        – baseline fwd+bwd
  no_tables   – stop_gradient on both built block tables (kills table grads
                AND build_block_tables backward)
  no_build    – tables built OUTSIDE grad, passed as diff args (keeps the
                row-scatter, kills build_block_tables backward)
  no_gridin   – stop_gradient on grid encode INPUTS (kills dfrac/dx chain)
  fwd         – forward only
"""

import sys, time
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from geneface_tpu.ops import sh_encode, trunc_exp
from geneface_tpu.ops.encoders import (
    block_grid_encode,
    build_block_tables,
    make_block_grid_meta,
    make_grid_meta,
)

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "full"
M = 1 << 20


def mlp_params(rng, dims):
    ps = []
    for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
        rng, k = jax.random.split(rng)
        ps.append(jax.random.normal(k, (a, b)) * (2.0 / a) ** 0.5)
    return ps


def mlp(ps, x):
    for i, w in enumerate(ps):
        x = x @ w
        if i < len(ps) - 1:
            x = jax.nn.relu(x)
    return x


def main():
    meta3 = make_grid_meta(3, 16, 2, 16, 16, 2048, gridtype="tiled")
    meta2 = make_grid_meta(2, 16, 2, 16, 16, 2048, gridtype="tiled")
    b3 = make_block_grid_meta(meta3)
    b2 = make_block_grid_meta(meta2)

    rng = jax.random.PRNGKey(0)
    emb3 = jax.random.uniform(rng, (meta3.n_entries, 2), minval=-1e-4, maxval=1e-4)
    emb2 = jax.random.uniform(rng, (meta2.n_entries, 2), minval=-1e-4, maxval=1e-4)
    amb_ps = mlp_params(rng, [32 + 64, 128, 128, 2])
    sig_ps = mlp_params(rng, [32 + 32, 128, 128, 129])
    col_ps = mlp_params(rng, [16 + 128 + 4, 128, 3])
    cond = jax.random.normal(jax.random.PRNGKey(2), (64,))
    ind = jax.random.normal(jax.random.PRNGKey(3), (4,))

    xyz = jax.random.uniform(jax.random.PRNGKey(1), (M, 3))
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (M, 1))

    def field(params, tables_in=None):
        emb3_, emb2_, amb_, sig_, col_ = params
        if VARIANT == "no_build":
            t3, t2 = tables_in
        else:
            t3 = build_block_tables(emb3_, b3)
            t2 = build_block_tables(emb2_, b2)
            if VARIANT == "no_tables":
                t3 = jax.lax.stop_gradient(t3)
                t2 = jax.lax.stop_gradient(t2)
        x01 = xyz
        if VARIANT == "no_gridin":
            pos_feat = block_grid_encode(jax.lax.stop_gradient(x01), t3, b3)
        else:
            pos_feat = block_grid_encode(x01, t3, b3)
        cond_rep = jnp.broadcast_to(cond[None], (M, 64))
        amb = jnp.tanh(mlp(amb_, jnp.concatenate([pos_feat, cond_rep], -1)))
        a01 = (amb + 1) / 2
        if VARIANT == "no_gridin":
            a01 = jax.lax.stop_gradient(a01)
        amb_feat = block_grid_encode(a01, t2, b2)
        h = mlp(sig_, jnp.concatenate([pos_feat, amb_feat], -1))
        sigma = trunc_exp(h[:, 0])
        geo = h[:, 1:]
        sh = sh_encode(dirs, 4)
        col = jax.nn.sigmoid(
            mlp(col_, jnp.concatenate([sh, geo, jnp.broadcast_to(ind[None], (M, 4))], -1))
        )
        return jnp.sum(sigma) + jnp.sum(col) + jnp.sum(amb)

    params = (emb3, emb2, amb_ps, sig_ps, col_ps)

    if VARIANT == "fwd":
        f = jax.jit(lambda p: field(p))
    elif VARIANT == "no_build":
        t3 = build_block_tables(emb3, b3)
        t2 = build_block_tables(emb2, b2)

        f = jax.jit(lambda p, t3, t2: jax.grad(
            lambda q: field(q, (t3, t2)))(p))
        out = f(params, t3, t2)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(5):
            out = f(params, t3, t2)
            jax.block_until_ready(out)
        print(f"{VARIANT}: {(time.time()-t0)/5*1e3:8.2f} ms")
        return
    else:
        f = jax.jit(lambda p: jax.grad(field)(p))

    out = f(params)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(5):
        out = f(params)
        jax.block_until_ready(out)
    print(f"{VARIANT}: {(time.time()-t0)/5*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
