"""Rigorous scatter timing: force a scalar checksum fetch per iteration so the
host cannot run ahead of the device; interleave variants to decorrelate."""
import time
from functools import partial
import jax, jax.numpy as jnp
import numpy as np

@partial(jax.jit, static_argnames=("n_rows",))
def scatter_xla(row, upd, n_rows):
    out = jnp.zeros((n_rows, upd.shape[-1]), jnp.float32).at[row].add(upd)
    return out, out[0, 0] + out[-1, -1]

def timeit_sync(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        _, s = fn(*args)
        float(s)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _, s = fn(*args)
        float(s)  # D2H forces full execution
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), float(np.min(ts))

key = jax.random.PRNGKey(0)
M = 1_000_000
print(f"HBM floor for 64MB read: ~78us on v5e", flush=True)
for R in (8192, 16384, 39304, 65536, 74088):
    k1, k2 = jax.random.split(jax.random.fold_in(key, R))
    row = jax.random.randint(k1, (M,), 0, R, jnp.int32)
    upd = jax.random.normal(k2, (M, 16), jnp.float32)
    med, mn = timeit_sync(scatter_xla, row, upd, R)
    print(f"R={R:6d}: xla scatter med {med*1e3:8.3f} ms  min {mn*1e3:8.3f} ms", flush=True)
