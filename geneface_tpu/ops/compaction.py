"""Sample compaction: evaluate the field only on valid march samples.

The TPU marcher emits fixed-shape ``[N, S]`` sample slabs with validity
masks (``ops/raymarch.py``) — static shapes for XLA, but the field (grid
encoders + MLPs, the dominant cost) then runs on all ``N*S`` positions even
though only ``mean_occupancy`` of them are real. The reference CUDA marcher
compacts with atomicAdd counters (``raymarching.cu:446-457``); TPU has no
atomics, but march samples are *prefix-contiguous per ray* (slot k of ray i
is valid iff ``k < n_i``), so compaction is exact with cumsum + gather.

Cost model that shaped this module (measured, v5e):
- [M]-row gathers from [R, W] tables: ~1.7 ns/row (W up to 128 free);
- 1-D element gathers: ~7 ns/element — 4x worse, avoid on [Mc] axes;
- scatter-add: ~6.5 ns/row — never on the sample axis.

Hence all per-slot segment data (ray id, segment start offset, any per-ray
broadcast) is produced by ONE small scatter of per-ray deltas at segment
starts followed by a cumsum — the "marker trick" — instead of [Mc]-sized
gathers. Per-ray reductions go through padded cumsum + two [N]-row gathers
at segment boundaries instead of a scatter.

Gradient path: the only scatter is the non-differentiated marker build;
segment sums/broadcasts are cumsum+gather whose VJPs are cumsum+scatter of
[N] rows (cheap). The expensive direction — a scatter-add over the sample
axis — never appears in forward or backward.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "CompactPlan",
    "make_compact_plan",
    "waterfill_valid",
    "compact_gather",
    "expand_to_slabs",
    "segment_broadcast",
    "segmented_cumsum",
    "segmented_cumsum_cm",
    "segment_sums",
    "segment_sums_cm",
]


class CompactPlan(NamedTuple):
    ray: jax.Array  # [Mc] int32 ray index of each compact slot
    src: jax.Array  # [Mc] int32 flat (ray*S + slot) source index into slabs
    valid: jax.Array  # [Mc] bool: slot holds a real sample
    total: jax.Array  # [] int32 number of real samples (may exceed Mc)
    offset: jax.Array  # [N] int32 exclusive-cumsum segment starts
    n: jax.Array  # [N] int32 samples per ray
    is_start: jax.Array  # [Mc] bool: slot is the first of its segment


def waterfill_valid(valid: jax.Array, capacity: int) -> jax.Array:
    """Fit a ``[N, S]`` prefix-dense validity mask into ``capacity`` slots by
    dropping the DEEPEST samples first, uniformly across rays.

    Why (round 5): :func:`make_compact_plan` packs samples ray-major, so a
    global-capacity overflow silently drops ALL samples of the last rays —
    whole bottom-of-frame rows render as background under budget pressure.
    Waterfilling instead finds the largest per-ray level ``q*`` with
    ``sum_i min(n_i, q*) <= capacity`` and grants every ray up to ``q*``
    samples (+ one partial level to the first remaining rays), so truncation
    removes the late-along-ray samples whose transmittance contribution is
    smallest. Exact when nothing overflows: ``capacity >= total`` returns
    ``valid`` unchanged. Output stays prefix-dense (a per-ray prefix cut).

    Cost: two [N, S]-mask reductions + elementwise — negligible next to the
    march. The reference's analog is its pre-sized sample buffer truncation
    (``raymarching.cu:446-457``), which is also per-ray-prefix.
    """
    N, S = valid.shape
    # sum_min(q) = sum_i min(n_i, q) = cumsum over slot levels of the
    # per-level ray counts (valid is prefix-dense, so level s is occupied
    # by exactly the rays with n_i > s)
    level_counts = jnp.sum(valid, axis=0, dtype=jnp.int32)  # [S]
    summin = jnp.cumsum(level_counts)  # [S], summin[q-1] = sum_min(q)
    qstar = jnp.sum(summin <= capacity).astype(jnp.int32)  # in [0, S]
    base = jnp.where(qstar > 0, summin[jnp.maximum(qstar - 1, 0)], 0)
    rem = jnp.maximum(capacity - base, 0)
    # partial level: first `rem` rays that have a sample at slot qstar
    has_extra = jnp.take(
        valid, jnp.minimum(qstar, S - 1), axis=1
    ) & (qstar < S)
    extra = has_extra & (jnp.cumsum(has_extra.astype(jnp.int32)) <= rem)
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    keep = (slot < qstar[None]) | ((slot == qstar[None]) & extra[:, None])
    return valid & keep


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
    # segment-start offset per slot, by the same telescoped-delta trick
    # (avoids an [Mc] element gather of offset[ray], ~7 ns/elem on TPU)
    off_delta = jnp.diff(offset, prepend=jnp.zeros((1,), offset.dtype))
    off_marker = jnp.zeros((capacity,), jnp.int32).at[offset].add(
        off_delta, mode="drop"
    )
    seg_start = jnp.cumsum(off_marker)  # [Mc] = offset[ray[j]]
    slot_in_ray = jnp.arange(capacity, dtype=jnp.int32) - seg_start
    src = ray * S + slot_in_ray
    valid_c = jnp.arange(capacity, dtype=jnp.int32) < jnp.minimum(total, capacity)
    src = jnp.where(valid_c, src, 0)
    return CompactPlan(
        ray=ray, src=src, valid=valid_c, total=total, offset=offset, n=n,
        is_start=slot_in_ray == 0,
    )


def compact_gather(plan: CompactPlan, slab: jax.Array) -> jax.Array:
    """Gather ``[N, S, ...]`` (or ``[N, S]``) slab values to ``[Mc, ...]``.

    Prefer a single call with a packed trailing axis: a ``[Mc]``-row gather
    of a ``[N*S, W]`` record costs the same as a 1-D gather (~4x less per
    value)."""
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

    NOTE: measured ~21 ms at Mc=524k, W=5 (XLA picks a transposed layout for
    the scattered slab) — kept for inference/diagnostics; the training path
    composites in compact space instead (``segment_sums``)."""
    flat_shape = (n_rays * n_steps + 1,) + values.shape[1:]
    dst = jnp.where(plan.valid, plan.src, n_rays * n_steps)
    out = (
        jnp.zeros(flat_shape, values.dtype)
        .at[dst]
        .set(values, mode="drop", unique_indices=True)
    )
    return out[:-1].reshape((n_rays, n_steps) + values.shape[1:])


def segment_broadcast(plan: CompactPlan, per_ray: jax.Array) -> jax.Array:
    """Broadcast a per-ray value [N] to compact slots [Mc] (marker trick).

    Differentiable in ``per_ray`` (diff → scatter-at-offsets → cumsum; the
    VJP is cumsum → gather-at-offsets → undiff, all cheap [N]-sized ops).
    """
    delta = jnp.diff(per_ray, prepend=jnp.zeros((1,), per_ray.dtype))
    cap = plan.ray.shape[0]
    marker = jnp.zeros((cap,), per_ray.dtype).at[plan.offset].add(
        delta, mode="drop"
    )
    return jnp.cumsum(marker)


def _shift_fill(x: jax.Array, k: int, axis: int) -> jax.Array:
    """Shift ``x`` by ``k`` along ``axis``, filling with the scan identity
    (zeros / False)."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (k, 0)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, x.shape[axis])
    return jnp.pad(x, pad)[tuple(sl)]


def segmented_cumsum(
    values: jax.Array, is_start: jax.Array, block: int = 512
) -> jax.Array:
    """Inclusive cumsum over [Mc, ...] that RESTARTS at segment boundaries.

    Exact per-segment prefixes: a single global cumsum followed by
    base-subtraction would catastrophically cancel in f32 (the running sum
    over ~0.5M slots reaches ~1e5-1e10 while per-segment partials are O(10)).
    The classic segmented-scan operator keeps every partial segment-local:
      (fa, va) ⊕ (fb, vb) = (fa|fb, vb + (fb ? 0 : va))

    Implementation: blocked Hillis-Steele (log-depth shifted adds on a
    [M/block, block] view, then a small cross-block carry pass with the same
    operator) instead of ``jax.lax.associative_scan`` — the tuple-operator
    associative_scan COMPILES catastrophically on the TPU toolchain
    (measured 175 s for [1.9M] f32, >10 min with a trailing W axis; the
    blocked form compiles in seconds and was the dominant cost of the whole
    train-step compile). Same operator, reassociated — per-segment partials
    stay segment-local, so the numerics match.
    """
    M = values.shape[0]
    tail = values.shape[1:]
    B = min(block, max(1, M))
    Mb = -(-M // B)
    padM = Mb * B - M

    f = jnp.pad(is_start.astype(bool), [(0, padM)])
    v = jnp.pad(values, [(0, padM)] + [(0, 0)] * len(tail))
    f = f.reshape(Mb, B)
    v = v.reshape((Mb, B) + tail)

    def fb(flags):  # broadcast flags over the value tail axes
        return flags.reshape(flags.shape + (1,) * len(tail))

    k = 1
    while k < B:
        fa = _shift_fill(f, k, 1)
        va = _shift_fill(v, k, 1)
        v = v + jnp.where(fb(f), 0.0, va)
        f = f | fa
        k *= 2

    # cross-block carry: inclusive scan of the shifted block summaries
    cf = _shift_fill(f[:, -1], 1, 0)  # [Mb]
    cv = _shift_fill(v[:, -1], 1, 0)  # [Mb, ...]
    k = 1
    while k < Mb:
        fa = _shift_fill(cf, k, 0)
        va = _shift_fill(cv, k, 0)
        cv = cv + jnp.where(fb(cf), 0.0, va)
        cf = cf | fa
        k *= 2
    v = v + jnp.where(fb(f), 0.0, cv[:, None])

    out = v.reshape((Mb * B,) + tail)
    return out[:M] if padM else out


def segment_sums(plan: CompactPlan, values: jax.Array) -> jax.Array:
    """Per-ray sums of compact per-slot values: [Mc, W] → [N, W].

    Segmented cumsum + one [N]-row gather at each segment's last slot — no
    scatter, and exact per segment (no global-cumsum cancellation). Rays
    with n=0 or starting beyond capacity get exact zeros.
    """
    cap = plan.ray.shape[0]
    pref = segmented_cumsum(values, plan.is_start)  # [Mc, W]
    last = jnp.clip(plan.offset + plan.n - 1, 0, cap - 1)
    out = pref[last]
    ok = (plan.n > 0) & (plan.offset < cap)
    return jnp.where(ok.reshape((-1,) + (1,) * (values.ndim - 1)), out, 0.0)


def segmented_cumsum_cm(
    values: jax.Array, is_start: jax.Array, block: int = 512
) -> jax.Array:
    """Channel-MAJOR segmented inclusive cumsum: values [W, M] → [W, M].

    Same blocked Hillis-Steele operator as :func:`segmented_cumsum`, but
    with the channels on the MAJOR axis: a [M, W] layout with small W
    lane-pads W→128 on TPU, so every shift pass of the scan drags 128/W×
    the real bytes; [W, M] keeps the scanned axis dense (measured on the
    512² composite: the [Mc, 6] form's scan passes dominate the composite).
    """
    W, M = values.shape
    B = min(block, max(1, M))
    Mb = -(-M // B)
    padM = Mb * B - M

    f = jnp.pad(is_start.astype(bool), [(0, padM)]).reshape(1, Mb, B)
    v = jnp.pad(values, [(0, 0), (0, padM)]).reshape(W, Mb, B)

    def shift(x, k, axis):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (k, 0)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, x.shape[axis])
        return jnp.pad(x, pad)[tuple(sl)]

    k = 1
    while k < B:
        fa = shift(f, k, 2)
        va = shift(v, k, 2)
        v = v + jnp.where(f, 0.0, va)
        f = f | fa
        k *= 2
    cf = shift(f[:, :, -1], 1, 1)  # [1, Mb]
    cv = shift(v[:, :, -1], 1, 1)  # [W, Mb]
    k = 1
    while k < Mb:
        fa = shift(cf, k, 1)
        va = shift(cv, k, 1)
        cv = cv + jnp.where(cf, 0.0, va)
        cf = cf | fa
        k *= 2
    v = v + jnp.where(f, 0.0, cv[:, :, None])
    out = v.reshape(W, Mb * B)
    return out[:, :M] if padM else out


def segment_sums_cm(plan: CompactPlan, values_cm: jax.Array) -> jax.Array:
    """Per-ray sums from channel-major values [W, Mc] → [W, N]."""
    cap = plan.ray.shape[0]
    pref = segmented_cumsum_cm(values_cm, plan.is_start)  # [W, Mc]
    last = jnp.clip(plan.offset + plan.n - 1, 0, cap - 1)
    out = pref[:, last]  # [W, N]
    ok = (plan.n > 0) & (plan.offset < cap)
    return jnp.where(ok[None, :], out, 0.0)
