"""Synchronized comparison of scatter-add strategies at real grid-bwd shapes."""
import time
from functools import partial
import jax, jax.numpy as jnp
import numpy as np

def sync_time(fn, *args, n=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        float(out[0, 0] + out[-1, -1]) if hasattr(out, 'shape') else float(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        float(out[0, 0] + out[-1, -1]) if hasattr(out, 'shape') else float(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))

@jax.jit
def noop(row, upd):
    return upd[:1, :1] * 1.0

@partial(jax.jit, static_argnames=("n_rows",))
def scatter_xla(row, upd, n_rows):
    return jnp.zeros((n_rows, upd.shape[-1]), jnp.float32).at[row].add(upd)

@partial(jax.jit, static_argnames=("n_rows", "chunk"))
def scatter_mm(row, upd, n_rows, chunk=8192):
    M, W = upd.shape
    n_chunks = M // chunk
    rows_c = row.reshape(n_chunks, chunk)
    upd_c = upd.reshape(n_chunks, chunk, W).astype(jnp.bfloat16)
    def body(acc, args):
        r, u = args
        onehot = (r[:, None] == jax.lax.broadcasted_iota(jnp.int32, (chunk, n_rows), 1)).astype(jnp.bfloat16)
        return acc + jax.lax.dot_general(onehot, u,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), None
    acc, _ = jax.lax.scan(body, jnp.zeros((n_rows, W), jnp.float32), (rows_c, upd_c))
    return acc

@partial(jax.jit, static_argnames=("n_rows",))
def scatter_sortseg(row, upd, n_rows):
    M, W = upd.shape
    order = jnp.argsort(row)
    keys = row[order]
    vals = upd[order]                    # [M, W] row gather
    csum = jnp.cumsum(vals.astype(jnp.float32), axis=0)
    csum = jnp.concatenate([jnp.zeros((1, W), jnp.float32), csum], 0)
    bounds = jnp.searchsorted(keys, jnp.arange(n_rows + 1, dtype=row.dtype))
    return csum[bounds[1:]] - csum[bounds[:-1]]

key = jax.random.PRNGKey(0)
M = 1_048_576
t = sync_time(noop, jnp.zeros((8,), jnp.int32), jnp.zeros((8, 8)))
print(f"roundtrip overhead: {t*1e3:.3f} ms", flush=True)
for R, W in ((8192, 16), (39304, 16), (65536, 16), (16384, 8)):
    k1, k2 = jax.random.split(jax.random.fold_in(key, R * W))
    row = jax.random.randint(k1, (M,), 0, R, jnp.int32)
    upd = jax.random.normal(k2, (M, W), jnp.float32)
    ref = np.asarray(scatter_xla(row, upd, R))
    t_x = sync_time(scatter_xla, row, upd, R)
    t_s = sync_time(scatter_sortseg, row, upd, R)
    err_s = float(np.abs(np.asarray(scatter_sortseg(row, upd, R)) - ref).max())
    line = f"R={R:6d} W={W:2d}: xla {t_x*1e3:7.2f}  sortseg {t_s*1e3:7.2f} (err {err_s:.1e})"
    if R <= 40000:
        t_m = sync_time(scatter_mm, row, upd, R)
        err_m = float(np.abs(np.asarray(scatter_mm(row, upd, R)) - ref).max() / (np.abs(ref).max() + 1e-9))
        line += f"  mm {t_m*1e3:7.2f} (rel {err_m:.1e})"
    print(line, flush=True)
