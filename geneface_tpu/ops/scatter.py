"""Row scatter-add: the bottleneck primitive of grid-encoder backward.

Measured on TPU v5e via the on-device loop harness (``tools/tpu_timeit.py``,
``tools/bench_scatter7.py``) at M=1M update rows, W=16:

=============  ========  =========================================
strategy       R=8192    notes
=============  ========  =========================================
XLA scatter     6.5 ms   grows to ~17 ms at R>=39k (per-update cost
                         6-16 ns; serialized read-modify-write)
one-hot matmul  7.4 ms   cost ∝ R (2·M·R·W FLOPs); loses above 8k
sort+segsum    17-28 ms  argsort-dominated
row gather      1.9 ms   (for scale: the forward's cost)
=============  ========  =========================================

The grid backward needs one such scatter **per level** (16 levels × 2 grids
per field eval), so this primitive sets the training-step floor. The XLA
scatter is the backend: the Pallas alternatives were built and measured
(v5e, jax 0.9 AOT) and all lose —

- lane-packed VMEM-accumulator RMW kernel (``ops/pallas_scatter.py``):
  ~24 ms at M=393k/W=32/R=5832 (~60 ns/update; Mosaic serializes
  dynamic-sublane read-modify-writes) vs ~2-5 ms XLA;
- MXU one-hot matmul: cost ∝ 2·M·R·W with ≤1/8 MXU utilization at W=32
  (lane width 128) — loses beyond R≈8k (7.4 ms measured via XLA einsum);
- vectorized in-kernel gathers/scatters (``jnp.take``/``take_along_axis``)
  do not lower in Mosaic on this stack (shape-mismatch / internal errors),
  leaving only the scalar loop above.

The kernel stays in-tree with tests as the documented negative result and
as a ready backend should Mosaic gain vectorized dynamic indexing.

Reference semantics equivalent: the atomicAdd accumulation in
``gridencoder/src/gridencoder.cu:248-341``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["scatter_add_rows"]


def scatter_add_rows(
    rows: jax.Array,  # [M] int32 destination row per update (OOB -> dropped)
    updates: jax.Array,  # [M, W] float
    n_rows: int,
) -> jax.Array:
    """``out[r] = sum_{i: rows[i]==r} updates[i]`` → [n_rows, W] f32.

    Any out-of-range row (negative included) is dropped. jax's
    ``mode="drop"`` alone would *wrap* negative indices python-style, so
    they are first redirected to the (dropped) index ``n_rows``.
    """
    rows = jnp.where((rows < 0) | (rows >= n_rows), n_rows, rows)
    return (
        jnp.zeros((n_rows, updates.shape[-1]), jnp.float32)
        .at[rows]
        .add(updates.astype(jnp.float32), mode="drop")
    )
