"""Matmul-scatter vs XLA row-scatter at the REAL fast-table shapes.

Per level the fge backward scatters M=1M updates of width K*C=16 into
[rows_lvl, 16]: rows_lvl = 8192 (block_hash levels) up to ~74k (largest
dense level). Also 2-D ambient grid: width 8, rows 16384/4.
"""
import sys, time
from functools import partial
import jax, jax.numpy as jnp

def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n

@partial(jax.jit, static_argnames=("n_rows",))
def scatter_xla(row, upd, n_rows):
    return jnp.zeros((n_rows, upd.shape[-1]), jnp.float32).at[row].add(upd)

@partial(jax.jit, static_argnames=("n_rows", "chunk"))
def scatter_mm(row, upd, n_rows, chunk=8192):
    M, W = upd.shape
    n_chunks = (M + chunk - 1) // chunk
    pad = n_chunks * chunk - M
    row = jnp.pad(row, (0, pad), constant_values=-1)
    upd = jnp.pad(upd, ((0, pad), (0, 0)))
    rows_c = row.reshape(n_chunks, chunk)
    upd_c = upd.reshape(n_chunks, chunk, W)
    def body(acc, args):
        r, u = args
        onehot = (r[:, None] == jax.lax.broadcasted_iota(jnp.int32, (chunk, n_rows), 1)).astype(jnp.bfloat16)
        return acc + jax.lax.dot_general(onehot, u.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), None
    acc, _ = jax.lax.scan(body, jnp.zeros((n_rows, W), jnp.float32), (rows_c, upd_c))
    return acc

def main():
    key = jax.random.PRNGKey(0)
    M = 1_000_000
    for R, W in ((8192, 16), (74088, 16), (16384, 8), (524288, 16)):
        k1, k2 = jax.random.split(jax.random.fold_in(key, R))
        row = jax.random.randint(k1, (M,), 0, R, jnp.int32)
        upd = jax.random.normal(k2, (M, W), jnp.float32)
        ref = scatter_xla(row, upd, R)
        t_x = timeit(scatter_xla, row, upd, R)
        for chunk in (8192, 32768):
            t = timeit(scatter_mm, row, upd, R, chunk)
            got = scatter_mm(row, upd, R, chunk)
            err = float(jnp.max(jnp.abs(got - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
            print(f"R={R:6d} W={W} chunk={chunk:5d}: mm {t*1e3:8.2f} ms  err={err:.2e}", flush=True)
        print(f"R={R:6d} W={W}: xla {t_x*1e3:8.2f} ms", flush=True)

main()
