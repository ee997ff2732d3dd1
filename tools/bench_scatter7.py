"""Scatter-add strategy shootout with the reliable on-device loop harness."""
import sys
sys.path.insert(0, "/root/repo/tools")
import jax, jax.numpy as jnp
from tpu_timeit import device_time

M = 1_048_576

def mk_scatter_xla(R):
    def step(i, row, upd):
        u = upd * (1.0 + i.astype(jnp.float32) * 1e-12)
        return jnp.zeros((R, upd.shape[-1]), jnp.float32).at[row].add(u)
    return step

def mk_scatter_mm(R, chunk):
    def step(i, row, upd):
        u = (upd * (1.0 + i.astype(jnp.float32) * 1e-12)).astype(jnp.bfloat16)
        n_chunks = M // chunk
        rows_c = row.reshape(n_chunks, chunk)
        upd_c = u.reshape(n_chunks, chunk, upd.shape[-1])
        def body(acc, args):
            r, uu = args
            onehot = (r[:, None] == jax.lax.broadcasted_iota(jnp.int32, (chunk, R), 1)).astype(jnp.bfloat16)
            return acc + jax.lax.dot_general(onehot, uu,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.zeros((R, upd.shape[-1]), jnp.float32), (rows_c, upd_c))
        return acc
    return step

def mk_sortseg(R):
    def step(i, row, upd):
        u = upd * (1.0 + i.astype(jnp.float32) * 1e-12)
        order = jnp.argsort(row)
        keys = row[order]
        vals = u[order]
        csum = jnp.cumsum(vals, axis=0)
        csum = jnp.concatenate([jnp.zeros((1, upd.shape[-1]), jnp.float32), csum], 0)
        bounds = jnp.searchsorted(keys, jnp.arange(R + 1, dtype=row.dtype))
        return csum[bounds[1:]] - csum[bounds[:-1]]
    return step

def mk_gather(R, table):
    def step(i, row, upd):
        t = table * (1.0 + i.astype(jnp.float32) * 1e-12)
        return t[row]
    return step

key = jax.random.PRNGKey(0)
for R, W in ((8192, 16), (39304, 16), (65536, 16)):
    k1, k2, k3 = jax.random.split(jax.random.fold_in(key, R), 3)
    row = jax.random.randint(k1, (M,), 0, R, jnp.int32)
    upd = jax.random.normal(k2, (M, W), jnp.float32)
    table = jax.random.normal(k3, (R, W), jnp.float32)
    t_x = device_time(mk_scatter_xla(R), row, upd)
    t_s = device_time(mk_sortseg(R), row, upd)
    t_g = device_time(mk_gather(R, table), row, upd)
    line = f"R={R:6d} W={W}: xla {t_x*1e3:7.2f}  sortseg {t_s*1e3:7.2f}  rowgather {t_g*1e3:6.2f}"
    for chunk in (8192,):
        t_m = device_time(mk_scatter_mm(R, chunk), row, upd)
        line += f"  mm[{chunk}] {t_m*1e3:7.2f}"
    print(line, flush=True)
