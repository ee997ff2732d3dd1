"""Probe the XLA TPU row-scatter fast-path threshold + hierarchical scatter."""
import time
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

@partial(jax.jit, static_argnames=("n_rows", "group"))
def scatter_hier(row, upd, n_rows, group=8192):
    G = (n_rows + group - 1) // group
    parts = []
    for g in range(G):
        local = row - g * group
        local = jnp.where((local >= 0) & (local < group), local, group)  # OOB -> dropped
        parts.append(jnp.zeros((group, upd.shape[-1]), jnp.float32).at[local].add(upd, mode="drop"))
    return jnp.concatenate(parts, 0)[:n_rows]

key = jax.random.PRNGKey(0)
M = 1_000_000
print("== threshold probe (W=16) ==", flush=True)
for R in (4096, 8192, 10240, 12288, 16384, 32768, 65536):
    k1, k2 = jax.random.split(jax.random.fold_in(key, R))
    row = jax.random.randint(k1, (M,), 0, R, jnp.int32)
    upd = jax.random.normal(k2, (M, 16), jnp.float32)
    t = timeit(scatter_xla, row, upd, R)
    print(f"R={R:6d}: xla {t*1e3:8.3f} ms", flush=True)
print("== W dependence at R=16384 ==", flush=True)
for W in (2, 8, 16, 32, 128):
    k1, k2 = jax.random.split(jax.random.fold_in(key, W))
    row = jax.random.randint(k1, (M,), 0, 16384, jnp.int32)
    upd = jax.random.normal(k2, (M, W), jnp.float32)
    t = timeit(scatter_xla, row, upd, 16384)
    print(f"W={W:4d}: xla {t*1e3:8.3f} ms", flush=True)
print("== hierarchical scatter ==", flush=True)
for R in (16384, 39304, 46656, 74088):
    k1, k2 = jax.random.split(jax.random.fold_in(key, R))
    row = jax.random.randint(k1, (M,), 0, R, jnp.int32)
    upd = jax.random.normal(k2, (M, 16), jnp.float32)
    ref = scatter_xla(row, upd, R)
    for group in (4096, 8192):
        t = timeit(scatter_hier, row, upd, R, group)
        got = scatter_hier(row, upd, R, group)
        err = float(jnp.max(jnp.abs(got - ref)))
        print(f"R={R:6d} group={group}: hier {t*1e3:8.3f} ms  err={err:.2e}", flush=True)
print(f"devices: {jax.devices()}", flush=True)
