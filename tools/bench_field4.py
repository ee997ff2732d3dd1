"""Round-4 field-backward decomposition on the real chip.

Times the pieces the round-3 stage budget could not separate: the ambient
encoder's input-gradient path, each scatter at its production shape, and the
dense-view adjoint — the candidates for the round-4 training-step work.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from tools.tpu_timeit import device_time


def main():
    M = int(os.environ.get("GF_M", 393216))
    from geneface_tpu.ops.encoders import make_grid_meta
    from geneface_tpu.ops.fused_grid import (
        fused_grid_encode,
        init_fused_embeddings,
        make_fused_grid_meta,
    )
    from geneface_tpu.ops.scatter import scatter_add_rows

    compute = os.environ.get("GF_GRID_DTYPE", "f32")
    cap = 16 - 1  # level_dim 4
    pos_meta = make_grid_meta(
        input_dim=3, num_levels=8, level_dim=4, base_resolution=16,
        log2_hashmap_size=cap, desired_resolution=2048, gridtype="tiled",
        interpolation="linear",
    )
    amb_meta = make_grid_meta(
        input_dim=2, num_levels=8, level_dim=4, base_resolution=16,
        log2_hashmap_size=cap, desired_resolution=2048, gridtype="tiled",
        interpolation="linear",
    )
    pos_f = make_fused_grid_meta(pos_meta, row_lanes=256, compute=compute)
    amb_f = make_fused_grid_meta(amb_meta, row_lanes=256, compute=compute)
    print("pos groups:", pos_f.groups, pos_f.modes, pos_f.n_rows)
    print("amb groups:", amb_f.groups, amb_f.modes, amb_f.n_rows)

    kp = jax.random.PRNGKey(0)
    pos_p = init_fused_embeddings(kp, pos_f)
    amb_p = init_fused_embeddings(jax.random.fold_in(kp, 1), amb_f)
    x3 = jax.random.uniform(jax.random.PRNGKey(2), (M, 3))
    x2 = jax.random.uniform(jax.random.PRNGKey(3), (M, 2))

    def t(name, fn, *args, iters=5):
        dt = device_time(fn, *args, iters=iters)
        print(f"{name:34s} {dt*1e3:8.2f} ms", flush=True)

    # encoders
    t("pos fwd", lambda i, p, x: fused_grid_encode(
        x * (1 + i.astype(jnp.float32) * 1e-12), p, pos_f, False), pos_p, x3)
    t("pos fwd+bwd (no in-grad)", lambda i, p, x: jax.grad(
        lambda pp: jnp.sum(fused_grid_encode(
            x * (1 + i.astype(jnp.float32) * 1e-12), pp, pos_f, False)))(p),
      pos_p, x3)
    t("amb fwd", lambda i, p, x: fused_grid_encode(
        x * (1 + i.astype(jnp.float32) * 1e-12), p, amb_f, False), amb_p, x2)
    t("amb fwd+bwd (no in-grad)", lambda i, p, x: jax.grad(
        lambda pp: jnp.sum(fused_grid_encode(
            x * (1 + i.astype(jnp.float32) * 1e-12), pp, amb_f, False)))(p),
      amb_p, x2)

    def amb_in(i, p, x):
        xx = x * (1 + i.astype(jnp.float32) * 1e-12)
        return jax.grad(
            lambda pp, xi: jnp.sum(fused_grid_encode(xi, pp, amb_f, True)),
            argnums=(0, 1),
        )(p, xx)

    t("amb fwd+bwd (with in-grad)", amb_in, amb_p, x2)

    # scatters at production shapes
    for (R, W, name) in [
        (8000, 32, "scatter dense-pos  R=8000 W=32"),
        (4096, 224, "scatter hash-pos  R=4096 W=224"),
        (648, 16, "scatter dense-amb R=648  W=16"),
        (8192, 112, "scatter hash-amb  R=8192 W=112"),
    ]:
        rows = jax.random.randint(jax.random.PRNGKey(7), (M,), 0, R)
        upd = jax.random.normal(jax.random.PRNGKey(8), (M, W))
        t(name, lambda i, r, u, R=R: scatter_add_rows(
            r, u * (1 + i.astype(jnp.float32) * 1e-12), R), rows, upd)

    # dense view + adjoint
    from geneface_tpu.ops.fused_grid import _dense_view, _dense_view_adjoint

    tbl = pos_p["group_0"]
    t("dense_view (pos)", lambda i, tb: _dense_view(
        tb * (1 + i.astype(jnp.float32) * 1e-12), pos_f, 0, jnp.float32), tbl)
    gv = jnp.ones((pos_f.n_rows[0], 32))
    t("dense_view_adjoint (pos)", lambda i, g: _dense_view_adjoint(
        g * (1 + i.astype(jnp.float32) * 1e-12), pos_f, 0), gv)


if __name__ == "__main__":
    main()
