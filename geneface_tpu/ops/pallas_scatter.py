"""Pallas TPU kernel: row scatter-add with lane-packed parallel accumulators.

The grid-encoder backward is a stream of ``acc[rows[i]] += updates[i]`` row
updates (the atomicAdd loop of ``gridencoder/src/gridencoder.cu:248-341``).
XLA lowers ``.at[rows].add`` to a serialized per-update read-modify-write
(~6-16 ns/update, ``ops/scatter.py`` table); this kernel keeps the
accumulator resident in VMEM and retires ``P`` updates per inner iteration
into ``P`` *independent* accumulator copies, so the read-modify-writes of an
iteration have no row conflicts and pipeline.

VMEM layout is the whole trick: a naive ``[P, R, W]`` f32 scratch pads the
minor axis W→128 lanes (8×8192×128×4 B = 32 MB — over budget). Packing the
copies **side-by-side in lanes** as ``[R, P·W]`` with ``P = 128 // W`` gives
one unpadded (R, 128) buffer: 4 MB at R=8192. Copy ``k`` owns lane block
``[k·W, (k+1)·W)``; the final grid step folds the P blocks and writes
``[R, W]``.

Updates with out-of-range rows are dropped (``mode="drop"`` parity with
:func:`geneface_tpu.ops.scatter.scatter_add_rows`). Accumulation is f32
regardless of the update dtype.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["scatter_add_rows_pallas", "pallas_scatter_max_rows"]

_LANES = 128
_VMEM_ACC_BUDGET = 8 * 1024 * 1024  # bytes of VMEM for the accumulator


def pallas_scatter_max_rows(width: int) -> int:
    """Largest n_rows the lane-packed accumulator supports at this width."""
    p = max(1, _LANES // width)
    row_bytes = p * width * 4
    return _VMEM_ACC_BUDGET // row_bytes


def _kernel(rows_ref, upd_ref, out_ref, acc_ref, *, n_rows, P, W, chunk):
    c = pl.program_id(0)
    nc = pl.num_programs(0)

    @pl.when(c == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(i, _):
        # P independent RMWs per iteration — distinct lane blocks, so no
        # read-after-write conflicts between the P copies even on row clashes
        for k in range(P):
            r = rows_ref[i * P + k]
            in_range = (r >= 0) & (r < n_rows)

            @pl.when(in_range)
            def _():
                acc_ref[pl.ds(r, 1), k * W:(k + 1) * W] += (
                    upd_ref[pl.ds(i * P + k, 1), :].astype(jnp.float32)
                )

        return 0

    jax.lax.fori_loop(0, chunk // P, body, 0)

    @pl.when(c == nc - 1)
    def _():
        folded = acc_ref[:, 0:W]
        for k in range(1, P):
            folded = folded + acc_ref[:, k * W:(k + 1) * W]
        out_ref[...] = folded


@partial(jax.jit, static_argnames=("n_rows", "chunk", "interpret"))
def scatter_add_rows_pallas(
    rows: jax.Array,  # [M] int32 destination rows (OOB -> dropped)
    updates: jax.Array,  # [M, W] float; W must divide 128
    n_rows: int,
    chunk: int = 4096,
    interpret: bool = False,
) -> jax.Array:
    """``out[r] = sum_{i: rows[i]==r} updates[i]`` → [n_rows, W] f32."""
    M, W = updates.shape
    assert _LANES % W == 0, f"width {W} must divide {_LANES}"
    P = _LANES // W
    assert n_rows <= pallas_scatter_max_rows(W), (
        f"n_rows={n_rows} exceeds the VMEM accumulator budget "
        f"({pallas_scatter_max_rows(W)}); use the XLA scatter"
    )
    # pad the update stream to a chunk multiple with dropped rows
    Mp = ((M + chunk - 1) // chunk) * chunk
    if Mp != M:
        rows = jnp.concatenate([rows, jnp.full((Mp - M,), -1, rows.dtype)])
        updates = jnp.concatenate(
            [updates, jnp.zeros((Mp - M, W), updates.dtype)]
        )
    n_chunks = Mp // chunk

    return pl.pallas_call(
        partial(_kernel, n_rows=n_rows, P=P, W=W, chunk=chunk),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, W), lambda c: (c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n_rows, W), lambda c: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_rows, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_rows, P * W), jnp.float32)],
        interpret=interpret,
    )(rows.astype(jnp.int32), updates)
