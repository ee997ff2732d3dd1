"""Is XLA TPU scatter-add cost per-ROW or per-BYTE? Decides grid level/width
architecture (fewer wider levels if per-row)."""
import sys
sys.path.insert(0, "/root/repo/tools")
import jax, jax.numpy as jnp
from tpu_timeit import device_time

key = jax.random.PRNGKey(0)
M = 1_048_576
R = 8192
for W in (8, 16, 32, 64, 128):
    for dt in (jnp.float32, jnp.bfloat16):
        k1, k2 = jax.random.split(jax.random.fold_in(key, W))
        row = jax.random.randint(k1, (M,), 0, R, jnp.int32)
        upd = jax.random.normal(k2, (M, W), dt)
        def step(i, row, upd):
            u = upd * (1.0 + i.astype(dt) * 1e-2)
            return jnp.zeros((R, W), dt).at[row].add(u)
        t = device_time(step, row, upd)
        print(f"W={W:4d} {dt.__name__:9s}: {t*1e3:7.2f} ms  ({t/M*1e9:5.2f} ns/row)", flush=True)
# gather W-dependence too
for W in (16, 32, 64, 128):
    k1, k2 = jax.random.split(jax.random.fold_in(key, 1000+W))
    row = jax.random.randint(k1, (M,), 0, R, jnp.int32)
    tab = jax.random.normal(k2, (R, W), jnp.bfloat16)
    def step(i, row, tab):
        t2 = tab * (1 + i.astype(jnp.bfloat16) * 1e-2)
        return t2[row]
    t = device_time(step, row, tab)
    print(f"gather W={W:4d} bf16: {t*1e3:7.2f} ms  ({t/M*1e9:5.2f} ns/row)", flush=True)
