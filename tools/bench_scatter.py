"""Microbench: embedding-gradient scatter strategies on TPU.

The grid-encoder backward must accumulate M≈1M row-gradients [M, W] into a
table [R, W] (R≈8k-65k rows/level). Compares:
  a) XLA row scatter-add (autodiff of gather)
  b) one-hot matmul accumulation (MXU), blocked with lax.map
  c) sort + segment_sum
  d) scalar scatter-add (flattened indices)
"""

import sys, time
import jax
import jax.numpy as jnp
import numpy as np

M = 1 << 20
W = 16
R = 8192


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    k = jax.random.PRNGKey(0)
    rows = jax.random.randint(k, (M,), 0, R)
    g = jax.random.normal(jax.random.PRNGKey(1), (M, W), jnp.float32)

    @jax.jit
    def xla_scatter(rows, g):
        return jnp.zeros((R, W), jnp.float32).at[rows].add(g)

    t = timeit(xla_scatter, rows, g)
    print(f"a) XLA row scatter:      {t*1e3:8.2f} ms")
    ref = xla_scatter(rows, g)

    BLK = 512

    @jax.jit
    def onehot_mm(rows, g):
        rb = rows.reshape(-1, BLK)
        gb = g.reshape(-1, BLK, W)

        def body(acc, args):
            r, gg = args
            oh = jax.nn.one_hot(r, R, dtype=jnp.bfloat16)  # [BLK, R]
            acc = acc + jax.lax.dot_general(
                oh, gg.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc, None

        acc, _ = jax.lax.scan(body, jnp.zeros((R, W), jnp.float32), (rb, gb))
        return acc

    t = timeit(onehot_mm, rows, g)
    out = onehot_mm(rows, g)
    err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"b) one-hot MM (scan):    {t*1e3:8.2f} ms  rel_err={err:.2e}")

    @jax.jit
    def sort_segsum(rows, g):
        order = jnp.argsort(rows)
        return jax.ops.segment_sum(g[order], rows[order], num_segments=R)

    t = timeit(sort_segsum, rows, g)
    print(f"c) sort+segment_sum:     {t*1e3:8.2f} ms")

    @jax.jit
    def scalar_scatter(rows, g):
        flat_idx = (rows[:, None] * W + jnp.arange(W)[None, :]).reshape(-1)
        return (
            jnp.zeros((R * W,), jnp.float32)
            .at[flat_idx]
            .add(g.reshape(-1))
            .reshape(R, W)
        )

    t = timeit(scalar_scatter, rows, g)
    print(f"d) scalar scatter:       {t*1e3:8.2f} ms")

    # e) segment_sum without sort (scatter under the hood? measure anyway)
    @jax.jit
    def segsum(rows, g):
        return jax.ops.segment_sum(g, rows, num_segments=R)

    t = timeit(segsum, rows, g)
    print(f"e) segment_sum (unsorted):{t*1e3:7.2f} ms")

    # f) gather side for reference
    @jax.jit
    def gather(rows):
        tab = jnp.zeros((R, W), jnp.float32)
        return tab[rows]

    t = timeit(gather, rows)
    print(f"f) row gather [1M,16]:   {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
