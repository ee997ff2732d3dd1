"""Bisect the fused-grid-encoder backward cost on the real chip.

``grid fwd+bwd`` measures ~35 ms at M=524k while the raw scatter floor is
~10 ms (tools/bench_rowops.py) — this tool times each backward ingredient in
isolation to find the overhead.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from geneface_tpu.ops.encoders import make_grid_meta
from geneface_tpu.ops.fused_grid import (
    _dense_view,
    fused_grid_encode,
    init_fused_embeddings,
    make_fused_grid_meta,
)
from geneface_tpu.ops.scatter import scatter_add_rows
from tools.tpu_timeit import device_time


def main():
    M = int(os.environ.get("GF_M", 524288))
    meta = make_grid_meta(
        input_dim=3, num_levels=8, level_dim=4, base_resolution=16,
        log2_hashmap_size=15, desired_resolution=2048, gridtype="tiled",
        interpolation="linear",
    )
    fmeta = make_fused_grid_meta(meta)
    print("groups:", fmeta.groups, "modes:", fmeta.modes, "rows:", fmeta.n_rows)
    params = init_fused_embeddings(jax.random.PRNGKey(0), fmeta)
    x01 = jax.random.uniform(jax.random.PRNGKey(1), (M, 3))

    def t(name, fn, *args, iters=5):
        dt = device_time(fn, *args, iters=iters)
        print(f"{name:28s} {dt*1e3:8.2f} ms", flush=True)

    # forward
    t("fwd", lambda i, p, x: fused_grid_encode(
        x * (1 + i.astype(jnp.float32) * 1e-12), p, fmeta), params, x01)

    # full grad (params + inputs)
    def g_all(i, p, x):
        xx = x * (1 + i.astype(jnp.float32) * 1e-12)
        return jax.grad(
            lambda pp, xxx: jnp.sum(fused_grid_encode(xxx, pp, fmeta)),
            argnums=(0, 1),
        )(p, xx)
    t("fwd+bwd (both)", g_all, params, x01)

    # params-only grad
    def g_p(i, p, x):
        xx = x * (1 + i.astype(jnp.float32) * 1e-12)
        return jax.grad(
            lambda pp: jnp.sum(fused_grid_encode(xx, pp, fmeta))
        )(p)
    t("fwd+bwd (params only)", g_p, params, x01)

    # input-only grad
    def g_x(i, p, x):
        xx = x * (1 + i.astype(jnp.float32) * 1e-12)
        return jax.grad(
            lambda xxx: jnp.sum(fused_grid_encode(xxx, p, fmeta))
        )(xx)
    t("fwd+bwd (inputs only)", g_x, params, x01)

    # raw scatters at the three shapes
    rows = jax.random.randint(jax.random.PRNGKey(2), (M,), 0, 4096)
    for gi in range(len(fmeta.groups)):
        W = (
            fmeta.base.level_dim * (1 << 3)
            if fmeta.modes[gi] == "dense"
            else fmeta.group_width(gi)
        )
        R = fmeta.n_rows[gi]
        upd = jax.random.normal(jax.random.PRNGKey(3), (M, W))
        r = jnp.minimum(rows, R - 1)
        t(
            f"raw scatter g{gi} R={R} W={W}",
            lambda i, r, u, R=R: scatter_add_rows(
                jnp.minimum(r + i, R - 1), u, R
            ),
            r, upd,
        )

    # dense-view transpose alone
    spec = jax.ShapeDtypeStruct(params["group_0"].shape, jnp.float32)
    gview = jax.random.normal(
        jax.random.PRNGKey(4),
        (fmeta.n_rows[0], 8 * fmeta.base.level_dim),
    )

    def dtrans(i, gv):
        g = gv * (1 + i.astype(jnp.float32) * 1e-12)
        (out,) = jax.linear_transpose(
            lambda tt: _dense_view(tt, fmeta, 0, jnp.float32), spec
        )(g)
        return out
    t("dense-view transpose", dtrans, gview)

    # dense-view forward alone
    t("dense-view fwd", lambda i, p: _dense_view(
        p["group_0"] * (1 + i.astype(jnp.float32) * 1e-12), fmeta, 0,
        jnp.float32), params)


if __name__ == "__main__":
    main()
