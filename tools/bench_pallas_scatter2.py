"""Lane-packed Pallas scatter-add vs XLA scatter on the real chip, plus a
probe of vectorized VMEM gathers (jnp.take inside a kernel).

Production shapes: grid-encode backward scatters M≈300-500k updates of width
K*C=32 into per-level tables of R≈6k-74k rows (bench config: 8 levels x 4ch,
log2_hashmap=16).
"""

import sys
from functools import partial

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from geneface_tpu.ops.pallas_scatter import (
    pallas_scatter_max_rows,
    scatter_add_rows_pallas,
)
from tpu_timeit import device_time


def bench_scatter():
    key = jax.random.PRNGKey(0)
    M, W = 393216, 32
    for R in (5832, 8192, 16384, 32768):
        if R > pallas_scatter_max_rows(W):
            print(f"R={R}: over VMEM budget, skipped")
            continue
        k1, k2 = jax.random.split(jax.random.fold_in(key, R))
        rows = jax.random.randint(k1, (M,), 0, R, jnp.int32)
        upd = jax.random.normal(k2, (M, W), jnp.float32)
        ref = jnp.zeros((R, W), jnp.float32).at[rows].add(upd)
        for chunk in (2048, 4096, 8192):
            got = scatter_add_rows_pallas(rows, upd, R, chunk=chunk)
            err = float(jnp.max(jnp.abs(got - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))

            def step_p(i, rows, upd, chunk=chunk):
                u = upd * (1.0 + i.astype(jnp.float32) * 1e-12)
                return scatter_add_rows_pallas(rows, u, R, chunk=chunk)

            t_p = device_time(step_p, rows, upd, iters=5)
            print(
                f"R={R:6d} chunk={chunk}: pallas {t_p*1e3:7.2f} ms rel_err={err:.1e}",
                flush=True,
            )

        def step_x(i, rows, upd):
            u = upd * (1.0 + i.astype(jnp.float32) * 1e-12)
            return jnp.zeros((R, W), jnp.float32).at[rows].add(u)

        t_x = device_time(step_x, rows, upd, iters=5)
        print(f"R={R:6d} xla: {t_x*1e3:7.2f} ms", flush=True)


def bench_gather_probe():
    """Can Mosaic vectorize a VMEM row gather? table[idx] for vector idx."""
    Rt, Wt = 8192, 128
    CH = 2048
    M = 393216

    def gkernel(idx_ref, table_ref, out_ref):
        out_ref[...] = jnp.take(table_ref[...], idx_ref[...], axis=0)

    @jax.jit
    def pallas_gather(idx, table):
        return pl.pallas_call(
            gkernel,
            grid=(idx.shape[0] // CH,),
            in_specs=[
                pl.BlockSpec((CH,), lambda c: (c,), memory_space=pltpu.VMEM),
                pl.BlockSpec((Rt, Wt), lambda c: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (CH, Wt), lambda c: (c, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((idx.shape[0], Wt), jnp.float32),
        )(idx, table)

    key = jax.random.PRNGKey(1)
    idx = jax.random.randint(key, (M,), 0, Rt, jnp.int32)
    table = jax.random.normal(jax.random.fold_in(key, 1), (Rt, Wt), jnp.float32)
    try:
        got = pallas_gather(idx, table)
        ref = table[idx]
        err = float(jnp.max(jnp.abs(got - ref)))
        print(f"pallas vmem gather compiles, err={err:.1e}", flush=True)

        def step_p(i, idx, table):
            t = table * (1.0 + i.astype(jnp.float32) * 1e-12)
            return pallas_gather(idx, t)

        t_p = device_time(step_p, idx, table, iters=5)

        def step_x(i, idx, table):
            t = table * (1.0 + i.astype(jnp.float32) * 1e-12)
            return t[idx]

        t_x = device_time(step_x, idx, table, iters=5)
        print(f"gather M={M} W={Wt}: pallas {t_p*1e3:.2f} ms  xla {t_x*1e3:.2f} ms",
              flush=True)
    except Exception as e:
        print(f"pallas vmem gather FAILED: {type(e).__name__}: {str(e)[:500]}",
              flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("all", "scatter"):
        bench_scatter()
    if mode in ("all", "gather"):
        bench_gather_probe()
