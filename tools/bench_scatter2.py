"""Microbench: XLA row scatter-add vs chunked one-hot matmul scatter.

The grid-encode backward must accumulate M=16M (row, [W]) updates into a
[R, W] table. XLA's native scatter is serial-ish on TPU; the MXU-native
formulation is ``onehot(idx)^T @ updates`` accumulated over point chunks.
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t0) / n


@partial(jax.jit, static_argnames=("n_rows", "chunk"))
def scatter_xla(row, upd, n_rows, chunk=None):
    out = jnp.zeros((n_rows, upd.shape[-1]), jnp.float32)
    return out.at[row].add(upd)


@partial(jax.jit, static_argnames=("n_rows", "chunk"))
def scatter_matmul(row, upd, n_rows, chunk=8192):
    M, W = upd.shape
    n_chunks = (M + chunk - 1) // chunk
    pad = n_chunks * chunk - M
    row = jnp.pad(row, (0, pad), constant_values=-1)
    upd = jnp.pad(upd, ((0, pad), (0, 0)))
    rows_c = row.reshape(n_chunks, chunk)
    upd_c = upd.reshape(n_chunks, chunk, W)

    def body(acc, args):
        r, u = args
        onehot = (
            r[:, None] == jax.lax.broadcasted_iota(jnp.int32, (chunk, n_rows), 1)
        ).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            onehot, u.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, None

    acc0 = jnp.zeros((n_rows, W), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (rows_c, upd_c))
    return acc


def main():
    key = jax.random.PRNGKey(0)
    M = 1_000_000
    W = 16
    for R in (8192, 32768):
        row = jax.random.randint(key, (M,), 0, R, jnp.int32)
        upd = jax.random.normal(key, (M, W), jnp.float32)
        ref = scatter_xla(row, upd, R)
        for chunk in (4096, 8192, 16384):
            t = timeit(scatter_matmul, row, upd, R, chunk)
            got = scatter_matmul(row, upd, R, chunk)
            err = float(jnp.max(jnp.abs(got - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
            print(f"R={R} chunk={chunk}: matmul {t*1e3:8.2f} ms  rel_err={err:.2e}")
        t = timeit(scatter_xla, row, upd, R)
        print(f"R={R}: xla scatter {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
