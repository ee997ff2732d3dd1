"""Sample compaction: evaluate the field only on valid march samples.

The TPU marcher emits fixed-shape ``[N, S]`` sample slabs with validity
masks (``ops/raymarch.py``) — static shapes for XLA, but the field (grid
encoders + MLPs, the dominant cost) then runs on all ``N*S`` positions even
though only ``mean_occupancy`` of them are real. The reference CUDA marcher
compacts with atomicAdd counters (``raymarching.cu:446-457``); TPU has no
atomics, but march samples are *prefix-contiguous per ray* (slot k of ray i
is valid iff ``k < n_i``), so compaction is exact with cumsum + gather:

  offset = exclusive_cumsum(n)                  # [N] segment starts
  ray(j) = cumsum(ones scattered at offsets)-1  # [Mc] ray of compact slot j
  src(j) = ray(j)*S + (j - offset[ray(j)])      # padded slot it came from

``Mc`` (capacity) is static; slots past the true total are masked invalid,
and if ``sum(n) > Mc`` the tail rays lose samples (callers size Mc with
headroom, as the reference sizes its buffers by the running mean count,
``renderer.py:98-101,302``).

Gradient path: ``compact``'s gathers are on non-differentiated index data;
``expand_to_slabs`` is a unique-index scatter whose VJP is a gather — both
TPU-cheap (the expensive direction, scatter-add with collisions, never
appears).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["CompactPlan", "make_compact_plan", "compact_gather", "expand_to_slabs"]


class CompactPlan(NamedTuple):
    ray: jax.Array  # [Mc] int32 ray index of each compact slot
    src: jax.Array  # [Mc] int32 flat (ray*S + slot) source index into slabs
    valid: jax.Array  # [Mc] bool: slot holds a real sample
    total: jax.Array  # [] int32 number of real samples (may exceed Mc)


def make_compact_plan(valid: jax.Array, capacity: int) -> CompactPlan:
    """Build the compaction index map from a ``[N, S]`` validity mask."""
    N, S = valid.shape
    n = valid.sum(-1).astype(jnp.int32)  # [N]
    csum = jnp.cumsum(n)
    offset = csum - n  # exclusive: segment start of each ray
    total = csum[-1]
    # ray id per compact slot: +1 marker at each segment start, cumsum.
    # Zero-length rays share an offset with their successor; the last ray at
    # a shared offset wins, which is the one that owns the samples.
    marker = jnp.zeros((capacity,), jnp.int32).at[offset].add(1, mode="drop")
    ray = jnp.cumsum(marker) - 1  # [Mc]
    slot_in_ray = jnp.arange(capacity, dtype=jnp.int32) - offset[ray]
    src = ray * S + slot_in_ray
    valid_c = jnp.arange(capacity, dtype=jnp.int32) < jnp.minimum(total, capacity)
    src = jnp.where(valid_c, src, 0)
    return CompactPlan(ray=ray, src=src, valid=valid_c, total=total)


def compact_gather(plan: CompactPlan, slab: jax.Array) -> jax.Array:
    """Gather ``[N, S, ...]`` (or ``[N, S]``) slab values to ``[Mc, ...]``."""
    flat = slab.reshape((slab.shape[0] * slab.shape[1],) + slab.shape[2:])
    out = flat[plan.src]
    mask = plan.valid.reshape((-1,) + (1,) * (out.ndim - 1))
    return jnp.where(mask, out, 0)


def expand_to_slabs(
    plan: CompactPlan, values: jax.Array, n_rays: int, n_steps: int
) -> jax.Array:
    """Scatter ``[Mc, ...]`` compact values back to ``[N, S, ...]`` slabs.

    Unique destination indices (a partial permutation): VJP is a gather.
    Invalid compact slots all collide on flat index 0 — route them to a
    sacrificial row and drop it so slot (0,0) stays exact.
    """
    flat_shape = (n_rays * n_steps + 1,) + values.shape[1:]
    dst = jnp.where(plan.valid, plan.src, n_rays * n_steps)
    out = (
        jnp.zeros(flat_shape, values.dtype)
        .at[dst]
        .set(values, mode="drop", unique_indices=True)
    )
    return out[:-1].reshape((n_rays, n_steps) + values.shape[1:])
