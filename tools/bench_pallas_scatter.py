"""Prototype: Pallas VMEM-accumulator scatter-add vs XLA scatter.

Strategy: P parallel f32 accumulators [P, R, W] in VMEM; each grid step
streams a chunk of updates (rows in SMEM, values in VMEM) and performs P
independent dynamic-row read-modify-writes per inner iteration (one per
accumulator, so no RAW conflicts between the P lanes); the final grid step
reduces the P accumulators into the output.
"""

import sys
from functools import partial

sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_timeit import device_time

P = 8  # parallel accumulators


def _kernel(rows_ref, upd_ref, out_ref, acc_ref):
    c = pl.program_id(0)
    nc = pl.num_programs(0)

    @pl.when(c == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    CH = upd_ref.shape[0]

    def body(i, _):
        for k in range(P):
            r = rows_ref[i * P + k]
            acc_ref[k, pl.ds(r, 1), :] += upd_ref[pl.ds(i * P + k, 1), :]
        return 0

    jax.lax.fori_loop(0, CH // P, body, 0)

    @pl.when(c == nc - 1)
    def _():
        out_ref[...] = jnp.sum(acc_ref[...], axis=0)


@partial(jax.jit, static_argnames=("n_rows", "chunk"))
def scatter_add_pallas(rows, upd, n_rows, chunk=8192):
    M, W = upd.shape
    n_chunks = M // chunk
    return pl.pallas_call(
        _kernel,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, W), lambda c: (c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_rows, W), lambda c: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((P, n_rows, W), jnp.float32)],
    )(rows, upd)


def main():
    key = jax.random.PRNGKey(0)
    M = 524288
    for R, W in ((8192, 16), (4096, 32), (16900, 16)):
        k1, k2 = jax.random.split(jax.random.fold_in(key, R))
        rows = jax.random.randint(k1, (M,), 0, R, jnp.int32)
        upd = jax.random.normal(k2, (M, W), jnp.float32)
        ref = jnp.zeros((R, W), jnp.float32).at[rows].add(upd)
        got = scatter_add_pallas(rows, upd, R)
        err = float(jnp.max(jnp.abs(got - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
        def step_p(i, rows, upd):
            u = upd * (1.0 + i.astype(jnp.float32) * 1e-12)
            return scatter_add_pallas(rows, u, R)
        t_p = device_time(step_p, rows, upd, iters=5)
        def step_x(i, rows, upd):
            u = upd * (1.0 + i.astype(jnp.float32) * 1e-12)
            return jnp.zeros((R, W), jnp.float32).at[rows].add(u)
        t_x = device_time(step_x, rows, upd, iters=5)
        print(
            f"R={R:6d} W={W}: pallas {t_p*1e3:7.2f} ms  xla {t_x*1e3:7.2f} ms"
            f"  rel_err={err:.1e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
