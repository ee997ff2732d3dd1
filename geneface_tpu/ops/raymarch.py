"""Occupancy-grid-accelerated ray marching + transmittance compositing.

TPU-native redesign of the reference CUDA raymarching extension
(``modules/radnerfs/raymarching/src/raymarching.cu``). The CUDA kernels
produce *ragged* compacted sample buffers via atomicAdd counters
(``kernel_march_rays_train:353-518``); on TPU we instead emit **fixed-capacity
padded slabs** ``[N, max_steps]`` with validity masks — static shapes that XLA
can tile onto the MXU, no D2H sync for sample counts (SURVEY §3.2, §7 hard
part 1/4).

Why padding is exact here, not an approximation: the marcher's step size is
``dt = clamp(t * dt_gamma, dt_min, dt_max)`` with
``dt_min = 2*sqrt(3)/max_steps`` (``raymarching.cu:466-472``), so a ray can
take at most ``(far-near)/dt_min <= max_steps`` occupied steps plus a bounded
number of empty-space micro-steps — a compile-time budget ``march_iters``
covers the whole walk.

Gradient story: ``march_rays_train`` returns sample *t-values* (non-diff,
as in CUDA); callers recompute ``xyz = o + t*d`` differentiably so ray-origin
gradients (``kernel_march_rays_train_backward:536``) come from autodiff.
``composite_rays`` uses the closed-form ``T_k = exp(-sum_{j<k} sigma_j dt_j)``
so JAX autodiff reproduces the hand-derived CUDA backward
(``kernel_composite_rays_train_backward:712``, formula at ``:786-792``)
exactly, including treating the ``T < T_thresh`` early-out as a constant mask.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "near_far_from_aabb",
    "march_rays_train",
    "march_rays_lattice",
    "pack_occ_blocks",
    "pack_occ_regions",
    "composite_rays",
    "MarchResult",
]

_SQRT3 = math.sqrt(3.0)


def near_far_from_aabb(
    rays_o: jax.Array,  # [N, 3]
    rays_d: jax.Array,  # [N, 3]
    aabb: jax.Array,  # [6] = (xmin, ymin, zmin, xmax, ymax, zmax)
    min_near: float = 0.05,
) -> tuple[jax.Array, jax.Array]:
    """Slab-test ray/AABB intersection (``kernel_near_far_from_aabb:92-146``).

    Returns (nears, fars), both float32 [N]; misses get ``far <= near``
    (encoded as float32 max, matching the CUDA kernel).
    """
    o = rays_o.astype(jnp.float32)
    d = rays_d.astype(jnp.float32)
    inv_d = 1.0 / d
    t0 = (aabb[:3] - o) * inv_d  # [N, 3]
    t1 = (aabb[3:] - o) * inv_d
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    near = jnp.max(tmin, axis=-1)
    far = jnp.min(tmax, axis=-1)
    miss = near > far
    near = jnp.maximum(near, min_near)
    fmax = jnp.float32(jnp.finfo(jnp.float32).max)
    return jnp.where(miss, fmax, near), jnp.where(miss, fmax, far)


class MarchResult(NamedTuple):
    ts: jax.Array  # [N, S] sample t (position along ray), fp32
    dts: jax.Array  # [N, S] step size at sample, fp32
    valid: jax.Array  # [N, S] bool sample validity mask (PREFIX-dense:
    #   slot j valid iff j < n_i — both marchers guarantee this, which is
    #   what ops/compaction.make_compact_plan requires)
    depth_ts: jax.Array  # [N, S] post-step t used for depth (cu deltas[:,1])
    #: scalar int32: max lattice steps any ray needs inside the tight
    #: occupied box (lattice march only; the signal for retuning lattice_K)
    span: jax.Array | None = None
    #: [N, S] int32 lattice step index of each sample (uniform-dt lattice
    #: march only): ts = t_start + ks*dt — lets renderers move ONE small
    #: integer per sample through compaction instead of a float record
    ks: jax.Array | None = None
    #: [N] f32 per-ray lattice origin (t_start) for the ks reconstruction
    t_start: jax.Array | None = None


def _exponent(x: jax.Array) -> jax.Array:
    """frexp-style binary exponent: x = m * 2^e with m in [0.5, 1)."""
    _, e = jnp.frexp(jnp.maximum(x, 1e-30))
    return e


@partial(
    jax.jit,
    static_argnames=(
        "bound", "dt_gamma", "max_steps", "cascade", "grid_size", "march_iters"
    ),
)
def march_rays_train(
    rays_o: jax.Array,  # [N, 3]
    rays_d: jax.Array,  # [N, 3]
    occ_grid: jax.Array,  # [cascade, H, H, H] bool occupancy
    nears: jax.Array,  # [N]
    fars: jax.Array,  # [N]
    noises: jax.Array,  # [N] in [0, 1): stratified jitter of the start t
    *,
    bound: float = 1.0,
    dt_gamma: float = 0.0,
    max_steps: int = 16,
    cascade: int = 1,
    grid_size: int = 128,
    march_iters: int | None = None,
) -> MarchResult:
    """DDA walk over the occupancy grid emitting padded sample slabs.

    Semantics mirror ``kernel_march_rays_train:353-518`` exactly (validated
    against a per-ray numpy oracle): start ``t0 = near + dt(near)*noise``;
    at an occupied cell emit a sample and advance by
    ``dt = clamp(t*dt_gamma, dt_min, dt_max)``; at an empty cell compute the
    DDA distance to the next voxel boundary and advance by repeated ``dt``
    micro-steps until past it (the CUDA do-while, ``:507-517``).

    Each scan iteration performs exactly one micro-step per ray, vectorized
    over N; ``march_iters`` (default ``4 * max_steps``) bounds the walk.
    All outputs are stop-gradiented by construction (integer/where ops only).
    """
    N = rays_o.shape[0]
    S = max_steps
    H = grid_size
    C = cascade
    if march_iters is None:
        # worst case: every micro-step advances by dt_min; the longest chord
        # of the [-b,b]^3 box is 2*sqrt(3)*b, and dt_min can be as small as
        # dt_max = 2*sqrt(3)*2^(C-1)/H -> up to ~H steps plus the samples
        march_iters = 2 * H + 2 * max_steps

    # per-component 1-D arrays: [N, 3] layouts pad the minor axis 3->128 on
    # TPU (42x memory); component columns are tight
    o3 = [jax.lax.stop_gradient(rays_o[:, i].astype(jnp.float32)) for i in range(3)]
    d3 = [jax.lax.stop_gradient(rays_d[:, i].astype(jnp.float32)) for i in range(3)]
    inv_d3 = [1.0 / c for c in d3]
    dt_max = 2.0 * _SQRT3 * (1 << (C - 1)) / H
    dt_min = min(dt_max, 2.0 * _SQRT3 / max_steps)
    # ``dt = clamp(t*dt_gamma, dt_min, dt_max)`` degenerates to a constant
    # whenever dt_min == dt_max (true for every face config: H=128 >= S=16).
    # Constant dt keeps samples on the per-ray lattice t0 + k*dt, so the
    # CUDA empty-space do-while (``raymarching.cu:507-517``) has the closed
    # form t += max(1, ceil((tt - t)/dt))*dt — one iteration per empty
    # region instead of one per micro-step — and a COARSE any-pooled
    # occupancy mip lets a single jump clear 8^3 fine cells at once.
    uniform_dt = dt_min == dt_max and C == 1

    def dt_of(t):
        return jnp.clip(t * dt_gamma, dt_min, dt_max)

    t0 = nears + dt_of(nears) * noises
    grid_flat = occ_grid.reshape(C, -1)
    if uniform_dt:
        # quantized chebyshev skip field: bit k of the byte says "some
        # occupied cell lies within chebyshev radius 2^k - 1 of this cell".
        # The lowest ZERO bit therefore gives a SAFE jump radius — every
        # lattice point inside the centered (2r+1)^3 box is in an empty
        # cell, so jumping to the box exit skips them all without changing
        # the emitted sample set (exactness as the block-mip scheme, but
        # centered: jumps don't collapse near block boundaries). Built from
        # the occupancy grid by separable dilation chaining (box dilation
        # radii compose additively), a few reduce_windows per call.
        occ0 = occ_grid[0].astype(jnp.uint8)

        def dilate(x, r):
            for axis in range(3):
                win = [1, 1, 1]
                win[axis] = 2 * r + 1
                x = jax.lax.reduce_window(
                    x, jnp.uint8(0), jax.lax.max, tuple(win), (1, 1, 1),
                    "SAME",
                )
            return x

        dil1 = dilate(occ0, 1)  # radius 1
        dil3 = dilate(dil1, 2)  # radius 3
        dil7 = dilate(dil3, 4)  # radius 7
        dil15 = dilate(dil7, 8)  # radius 15
        mip_byte = (
            occ0 | (dil1 << 1) | (dil3 << 2) | (dil7 << 3) | (dil15 << 4)
        ).reshape(-1)

    def occupancy_and_skip(t):
        """Occupancy at position t plus the DDA skip target (cu:466-510)."""
        pos3 = [jnp.clip(oc + t * dc, -bound, bound) for oc, dc in zip(o3, d3)]
        dt = dt_of(t)
        if C > 1:
            mx = jnp.maximum(
                jnp.abs(pos3[0]), jnp.maximum(jnp.abs(pos3[1]), jnp.abs(pos3[2]))
            )
            mip_pos = jnp.clip(_exponent(mx), 0, C - 1)
            mip_dt = jnp.clip(_exponent(dt * H * 0.5), 0, C - 1)
            level = jnp.maximum(mip_pos, mip_dt)
            mip_bound = jnp.minimum(jnp.exp2(level.astype(jnp.float32)), bound)
        else:
            level = jnp.zeros_like(t, dtype=jnp.int32)
            mip_bound = jnp.full_like(t, min(1.0, bound))
        mip_rbound = 1.0 / mip_bound
        # nearest grid cell (int truncation as the CUDA float->int cast)
        cell3 = [
            jnp.clip(0.5 * (p * mip_rbound + 1.0) * H, 0.0, float(H - 1)).astype(
                jnp.int32
            )
            for p in pos3
        ]
        lin = (cell3[0] * H + cell3[1]) * H + cell3[2]
        occ = grid_flat[level, lin]  # [N] bool
        # distance to next voxel boundary along each axis
        t_skip = None
        for cell, p, dc, inv_dc in zip(cell3, pos3, d3, inv_d3):
            nxt = (
                ((cell.astype(jnp.float32) + 0.5 + 0.5 * jnp.sign(dc)) * (2.0 / H) - 1.0)
                * mip_bound
                - p
            ) * inv_dc
            t_skip = nxt if t_skip is None else jnp.minimum(t_skip, nxt)
        t_target = t + jnp.maximum(0.0, t_skip)
        return occ, t_target

    slot_iota = jnp.arange(S, dtype=jnp.int32)[None, :]  # [1, S]

    if uniform_dt:
        dt = dt_min
        mip_bound = min(1.0, bound)

        def cond_u(state):
            it, t, n_valid, *_ = state
            return (it < march_iters) & jnp.any((t < fars) & (n_valid < S))

        def body_u(state):
            it, t, n_valid, ts, dts, dpts = state
            alive = (t < fars) & (n_valid < S)
            pos3 = [jnp.clip(oc + t * dc, -bound, bound) for oc, dc in zip(o3, d3)]
            cell3 = [
                jnp.clip(0.5 * (p / mip_bound + 1.0) * H, 0.0, float(H - 1))
                .astype(jnp.int32)
                for p in pos3
            ]
            lin = (cell3[0] * H + cell3[1]) * H + cell3[2]
            b = mip_byte[lin]  # the ONLY gather of the iteration
            occ_f = (b & 1) > 0
            # safe chebyshev radius = largest 2^k - 1 whose dilation bit is 0
            r = jnp.where(
                (b & 16) == 0, 15.0,
                jnp.where((b & 8) == 0, 7.0,
                          jnp.where((b & 4) == 0, 3.0,
                                    jnp.where((b & 2) == 0, 1.0, 0.0))),
            )
            # distance to the exit of the empty box [cell-r, cell+r]:
            # face (cell + r + 1)*s - mb along +dir, (cell - r)*s - mb along -
            cs = 2.0 * mip_bound / H
            t_skip = None
            for cell, p, dc, inv_dc in zip(cell3, pos3, d3, inv_d3):
                cf = cell.astype(jnp.float32)
                face = jnp.where(dc > 0, cf + r + 1.0, cf - r) * cs - mip_bound
                nxt = (face - p) * inv_dc
                t_skip = nxt if t_skip is None else jnp.minimum(t_skip, nxt)
            target = t + jnp.maximum(0.0, t_skip)

            emit = alive & occ_f
            write = emit[:, None] & (slot_iota == n_valid[:, None])
            ts = jnp.where(write, t[:, None], ts)
            dts = jnp.where(write, dt, dts)
            dpts = jnp.where(write, (t + dt)[:, None], dpts)
            n_valid = n_valid + emit.astype(jnp.int32)

            # lattice-preserving jump past the whole empty region:
            # t += max(1, ceil((tt - t)/dt)) * dt == the CUDA do-while result
            k = jnp.maximum(jnp.ceil((target - t) / dt - 1e-5), 1.0)
            t = jnp.where(alive, jnp.where(occ_f, t + dt, t + k * dt), t)
            return (it + 1, t, n_valid, ts, dts, dpts)

        init_u = (
            jnp.int32(0),
            t0,
            jnp.zeros((N,), jnp.int32),
            jnp.zeros((N, S), jnp.float32),
            jnp.zeros((N, S), jnp.float32),
            jnp.zeros((N, S), jnp.float32),
        )
        _, t, n_valid, ts, dts, dpts = jax.lax.while_loop(cond_u, body_u, init_u)
        valid = slot_iota < n_valid[:, None]
        return MarchResult(ts=ts, dts=dts, valid=valid, depth_ts=dpts)

    def cond(state):
        it, t, _, n_valid, *_ = state
        any_alive = jnp.any((t < fars) & (n_valid < S))
        return (it < march_iters) & any_alive

    def body(state):
        it, t, tt_target, n_valid, ts, dts, dpts = state
        alive = (t < fars) & (n_valid < S)
        pending_skip = t < tt_target  # still inside an empty-space do-while
        occ, t_skip = occupancy_and_skip(t)
        dt = dt_of(t)

        emit = alive & ~pending_skip & occ
        write = emit[:, None] & (slot_iota == n_valid[:, None])  # [N, S]
        ts = jnp.where(write, t[:, None], ts)
        dts = jnp.where(write, dt[:, None], dts)
        dpts = jnp.where(write, (t + dt)[:, None], dpts)
        n_valid = n_valid + emit.astype(jnp.int32)

        # start a skip when at an empty cell; keep the old target otherwise
        start_skip = alive & ~pending_skip & ~occ
        tt_target = jnp.where(start_skip, t_skip, tt_target)
        # every alive ray advances exactly one micro-step (emit or do-while)
        t = jnp.where(alive, t + dt, t)
        return (it + 1, t, tt_target, n_valid, ts, dts, dpts)

    init = (
        jnp.int32(0),
        t0,
        jnp.full((N,), -jnp.inf, jnp.float32),
        jnp.zeros((N,), jnp.int32),
        jnp.zeros((N, S), jnp.float32),
        jnp.zeros((N, S), jnp.float32),
        jnp.zeros((N, S), jnp.float32),
    )
    # while_loop: typical walks finish far earlier than the worst-case cap
    _, t, _, n_valid, ts, dts, dpts = jax.lax.while_loop(cond, body, init)
    valid = slot_iota < n_valid[:, None]
    return MarchResult(ts=ts, dts=dts, valid=valid, depth_ts=dpts)


def pack_occ_blocks(occ0: jax.Array, block: int = 8) -> jax.Array:
    """Bit-pack a [H, H, H] bool occupancy grid into ``block``³-cell blocks.

    ``block=8`` → uint32 [ (H/8)³, 16 ]: row b holds the 512 occupancy bits
    of block b (x-major block order), in-block linear index
    ``ix*64 + iy*8 + iz`` — word ``ix*2 + (iy>>2)``, bit ``(iy&3)*8 + iz``.
    ``block=4`` → uint32 [ (H/4)³, 2 ]: 64 bits per block, index
    ``ix*16 + iy*4 + iz`` — word ``ix>>1``, bit ``((ix&1)<<4)|(iy<<2)|iz``.

    Why: the marcher's only per-iteration memory traffic is occupancy
    lookups. 1-D element gathers from the 2M-cell grid cost ~7 ns each on
    v5e; ROW gathers from a <=287k-row table cost ~2 ns per row
    (``tools/bench_rowops.py``), so fetching a whole block per index turns
    the march's gather bill into elementwise bit tests. The 4³ packing has
    8x fewer word lanes to select over (the gather bill is per-row and
    identical), so the marcher's elementwise word-select traffic drops 8x.
    """
    H = occ0.shape[0]
    assert H % block == 0, "grid size must be a multiple of the block size"
    B = H // block
    if block == 4:
        r = occ0.reshape(B, 4, B, 4, B, 4).astype(jnp.uint32)
        iy = jax.lax.broadcasted_iota(jnp.uint32, (4, 4), 0)
        iz = jax.lax.broadcasted_iota(jnp.uint32, (4, 4), 1)
        # bits for (ix&1, iy, iz) within a word: ((ix&1)<<4) | (iy<<2) | iz
        w0 = jnp.left_shift(jnp.uint32(1), iy * 4 + iz)  # ix&1 == 0
        w1 = jnp.left_shift(jnp.uint32(1), 16 + iy * 4 + iz)  # ix&1 == 1
        # words[bx, ix2, by, bz] with ix2 = ix>>1 in {0,1}
        r = r.reshape(B, 2, 2, B, 4, B, 4)
        w = jnp.stack([w0, w1]).reshape(1, 1, 2, 1, 4, 1, 4).astype(jnp.uint32)
        words = jnp.sum(r * w, axis=(2, 4, 6))  # [B, 2, B, B]
        words = words.transpose(0, 2, 3, 1)  # [bx, by, bz, ix2]
        return words.reshape(-1, 2)
    assert block == 8, "supported block sizes: 4, 8"
    r = occ0.reshape(B, 8, B, 8, B, 8).astype(jnp.uint32)
    # weight in-block (iy&3, iz) bits within a word
    iy = jax.lax.broadcasted_iota(jnp.uint32, (4, 8), 0)
    iz = jax.lax.broadcasted_iota(jnp.uint32, (4, 8), 1)
    w = jnp.left_shift(jnp.uint32(1), iy * 8 + iz)  # [4, 8]
    # words[bx, ix, by, iy2, bz] with iy2 = iy>>2 in {0,1}
    r = r.reshape(B, 8, B, 2, 4, B, 8)
    words = jnp.sum(
        r * w.reshape(1, 1, 1, 1, 4, 1, 8).astype(jnp.uint32), axis=(4, 6)
    )  # [B, 8, B, 2, B]
    # -> [bx, by, bz, ix*2 + iy2]
    words = words.transpose(0, 2, 4, 1, 3).reshape(B, B, B, 16)
    return words.reshape(-1, 16)


def pack_occ_regions(occ0: jax.Array) -> jax.Array:
    """Bit-pack occupancy into OVERLAPPING 8³-cell regions on a 4³ core grid.

    Row ``c`` (core = 4³ cells) holds the 512 occupancy bits of the halo
    region ``[4c-2, 4c+6)`` per axis — core ± a 2-cell halo. Because one
    uniform-dt lattice step moves at most ``√3 < 2`` cells per axis, BOTH
    samples of a consecutive pair lie inside the region of the first
    sample's core: the marcher can gather ONE region row per TWO lattice
    points (half the per-sample gather bill, which dominates the march).
    In-region word/bit layout matches :func:`pack_occ_blocks` (block=8).

    Storage: ``[(H/4)³, 16]`` uint32 (4x the aligned packing; 8 MB at
    H=128 — irrelevant next to the gather savings).
    """
    H = occ0.shape[0]
    assert H % 4 == 0
    B = H // 4
    # Region cell j of core c is Q[4c + j] (j in [0,8)). Factor j = 4*hi+lo:
    # Q[4(c+hi) + lo] = V[c + hi, lo] on the [B+2, 4] period view — so the
    # whole construction is ONE reshape + two unit-offset slices per axis
    # (8 slices total; the naive 8-offsets-per-axis form emitted 512 strided
    # slices and measured 1.6 ms/call + poisoned XLA fusion in bf16 graphs).
    Q = jnp.pad(occ0.astype(jnp.uint32), [(2, 6)] * 3)
    V = Q.reshape(B + 2, 4, 4 * (B + 2), 4 * (B + 2))
    parts = []
    for hx in range(2):
        for hy in range(2):
            for hz in range(2):
                s = V[hx : hx + B].reshape(B, 4, B + 2, 4, 4 * (B + 2))
                s = s[:, :, hy : hy + B].reshape(B, 4, B, 4, B + 2, 4)
                s = s[:, :, :, :, hz : hz + B]
                parts.append(s)  # [B, 4lx, B, 4ly, B, 4lz]
    A = jnp.stack(parts).reshape(2, 2, 2, B, 4, B, 4, B, 4)
    # word = ix*2 + (iy>>2) = hx*8 + lx*2 + hy, bit = (iy&3)*8 + iz
    #      = ly*8 + hz*4 + lz  (pack_occ_blocks layout with ix=4hx+lx etc.)
    shift = (
        jax.lax.broadcasted_iota(jnp.uint32, (2, 4, 4), 0) * 4  # hz
        + jax.lax.broadcasted_iota(jnp.uint32, (2, 4, 4), 1) * 8  # ly
        + jax.lax.broadcasted_iota(jnp.uint32, (2, 4, 4), 2)  # lz
    ).reshape(1, 1, 2, 1, 1, 1, 4, 1, 4)
    words = jnp.sum(A << shift, axis=(2, 6, 8))  # [2hx, 2hy, B, 4lx, B, B]
    words = words.transpose(2, 4, 5, 0, 3, 1)  # [B, B, B, hx, lx, hy]
    return words.reshape(-1, 16)


def _occupied_cell_aabb(occ0: jax.Array, bound: float) -> jax.Array:
    """Tight world AABB of occupied cells (+1-cell margin), [6] on device.

    Same construction as ``renderer.occupied_aabb`` (kept local: ops must
    not import models). Falls back to the full cube when the grid is empty.
    """
    H = occ0.shape[0]
    idx = jnp.arange(H, dtype=jnp.float32)
    mip_bound = min(1.0, bound)
    lohi = []
    for ax in ((1, 2), (0, 2), (0, 1)):
        any_i = jnp.any(occ0, axis=ax)
        lo = jnp.min(jnp.where(any_i, idx, jnp.float32(H)))
        hi = jnp.max(jnp.where(any_i, idx, jnp.float32(-1)))
        lohi.append((lo, hi))
    empty = ~jnp.any(occ0)
    los = jnp.stack([((lh[0] - 1.0) / H * 2.0 - 1.0) * mip_bound for lh in lohi])
    his = jnp.stack([((lh[1] + 2.0) / H * 2.0 - 1.0) * mip_bound for lh in lohi])
    b = float(bound)
    full = jnp.asarray([-b, -b, -b, b, b, b], jnp.float32)
    los = jnp.where(empty, full[:3], jnp.maximum(los, full[:3]))
    his = jnp.where(empty, full[3:], jnp.minimum(his, full[3:]))
    return jnp.concatenate([los, his])


@partial(
    jax.jit,
    static_argnames=(
        "bound", "dt_gamma", "max_steps", "cascade", "grid_size", "lattice_K",
        "occ_block", "paired",
    ),
)
def march_rays_lattice(
    rays_o: jax.Array,  # [N, 3]
    rays_d: jax.Array,  # [N, 3]
    occ_grid: jax.Array,  # [1, H, H, H] bool
    nears: jax.Array,  # [N] (from the full training AABB — defines the lattice)
    fars: jax.Array,  # [N]
    noises: jax.Array,  # [N] in [0, 1)
    *,
    bound: float = 1.0,
    dt_gamma: float = 0.0,
    max_steps: int = 16,
    cascade: int = 1,
    grid_size: int = 128,
    lattice_K: int = 32,
    occ_block: int = 8,
    paired: bool | None = None,
) -> MarchResult:
    """Fully-parallel exact march for the uniform-dt regime — no while loop.

    Valid whenever ``dt = clamp(t*dt_gamma, dt_min, dt_max)`` saturates at a
    constant (every face config: ``H >= max_steps`` makes ``dt_min == dt_max``,
    and ``t*dt_gamma <= dt_min`` throughout the volume). Then the CUDA walk's
    visited positions are exactly the lattice ``t_k = t0 + k*dt``
    (``kernel_march_rays_train:353-518``), so marching = testing occupancy at
    lattice points. Three exactness-preserving reductions make that cheap:

    1. lattice points before the ray enters the tight occupied-cell AABB lie
       in empty cells (the box bounds every occupied cell with margin) — fast
       forward by a whole number of steps, keeping lattice alignment;
    2. only ``lattice_K`` points are tested after entry — callers size the
       static budget from the box diameter (``span`` in the result's
       ``depth_ts`` companion metric; see RADNeRFTask's bucket retune). The
       reference truncates the same way when its pre-sized sample buffer
       fills (``raymarching.cu:446-457`` drops samples beyond ``M``);
    3. occupancy comes from one ``[N*K]`` ROW gather of 8^3-cell bit-packed
       blocks (:func:`pack_occ_blocks`) + elementwise bit tests.

    Returns a :class:`MarchResult` with slab width ``lattice_K`` (not
    ``max_steps``); the per-ray sample count is still capped at
    ``max_steps``. Callers that retune ``lattice_K`` can measure the
    required span with :func:`lattice_span_cells`.
    """
    assert cascade == 1, "lattice march requires cascade == 1"
    N = rays_o.shape[0]
    H = grid_size
    K = lattice_K
    dt_max = 2.0 * _SQRT3 / H
    dt_min = min(dt_max, 2.0 * _SQRT3 / max_steps)
    assert dt_min == dt_max, "lattice march requires the uniform-dt regime"
    dt = dt_min
    mip_bound = min(1.0, bound)

    o3 = [jax.lax.stop_gradient(rays_o[:, i].astype(jnp.float32)) for i in range(3)]
    d3 = [jax.lax.stop_gradient(rays_d[:, i].astype(jnp.float32)) for i in range(3)]

    t0 = nears + dt * noises
    tight = _occupied_cell_aabb(occ_grid[0], bound)
    tn, tf = near_far_from_aabb(rays_o, rays_d, tight, 0.0)
    # fast-forward to the tight box on the ORIGINAL lattice
    k0 = jnp.ceil(jnp.maximum(tn - t0, 0.0) / dt - 1e-5)
    k0 = jnp.where(tn > 1e30, jnp.float32(2 * H), k0)  # miss -> everything masked
    t_start = t0 + k0 * dt
    # lattice_K retune signal (same construction as lattice_span_cells,
    # reusing this call's tight box + slab test instead of a second pass)
    lo = jnp.maximum(tn, nears)
    hi = jnp.minimum(tf, fars)
    span_w = jnp.where((tn < 1e30) & (hi > lo), hi - lo, 0.0)
    span = jnp.ceil(jnp.max(span_w) / dt).astype(jnp.int32) + 1

    # pair stride: gather one overlapping-region row per TWO lattice points
    # (pack_occ_regions) — exact because one step moves < 2 cells per axis.
    # MEASURED NEGATIVE on v5e (kept opt-in via GF_MARCH_PAIRED=1): halving
    # the gather count bought nothing (march 8.24 vs 8.18 ms at N=65k K=43 —
    # the march is select/elementwise-bound, not gather-bound, and row
    # gathers at these sizes are already bandwidth-cheap), while the paired
    # graph interacted pathologically with bf16 grid compute downstream
    # (full loss fwd 34 ms vs 18 ms). The exactness tests keep both paths
    # honest should a future toolchain change the trade.
    import os as _os

    if paired is None:
        paired = bool(_os.environ.get("GF_MARCH_PAIRED"))
    paired = paired and occ_block == 8 and K >= 2
    Ke = K + (K % 2) if paired else K

    ks = jnp.arange(Ke, dtype=jnp.float32)[None, :]  # [1, Ke]
    ts = t_start[:, None] + ks * dt  # [N, Ke]
    in_range = ts < jnp.minimum(fars, tf + dt)[:, None]

    cell3 = []
    for oc, dc in zip(o3, d3):
        p = jnp.clip(oc[:, None] + ts * dc[:, None], -bound, bound)
        cell3.append(
            jnp.clip(0.5 * (p / mip_bound + 1.0) * H, 0.0, float(H - 1)).astype(
                jnp.int32
            )
        )
    if paired:
        K2 = Ke // 2
        B4 = H // 4
        regions = pack_occ_regions(occ_grid[0])  # [(H/4)^3, 16]
        ce3 = [c[:, 0::2] for c in cell3]  # even-sample cells [N, K2]
        core = ((ce3[0] >> 2) * B4 + (ce3[1] >> 2)) * B4 + (ce3[2] >> 2)
        rows = regions[core.reshape(-1)].reshape(N, K2, 1, 16)
        # per-sample coords relative to the region origin 4*core - 2
        rel = [
            c.reshape(N, K2, 2) - ((ce[:, :, None] >> 2) * 4 - 2)
            for c, ce in zip(cell3, ce3)
        ]
        ix, iy, iz = rel
        word_sel = (ix << 1) | (iy >> 2)  # [N, K2, 2] in 0..15
        bit = ((iy & 3) << 3) | iz
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 16), 3)
        word = jnp.sum(
            jnp.where(lane == word_sel[..., None], rows, jnp.uint32(0)),
            axis=-1,
        ).reshape(N, Ke)
        occ = (
            jnp.right_shift(word, bit.reshape(N, Ke).astype(jnp.uint32))
            & jnp.uint32(1)
        ) > 0
    else:
        blk = occ_block
        blocks = pack_occ_blocks(occ_grid[0], block=blk)  # [(H/blk)^3, W]
        W = blocks.shape[1]
        B = H // blk
        shift = blk.bit_length() - 1
        bx, by, bz = (c >> shift for c in cell3)
        row = (bx * B + by) * B + bz  # [N, Ke]
        rows = blocks[row.reshape(-1)].reshape(N, Ke, W)  # ONE row gather
        ix, iy, iz = (c & (blk - 1) for c in cell3)
        if blk == 8:
            word_sel = (ix << 1) | (iy >> 2)  # [N, Ke] in 0..15
            bit = ((iy & 3) << 3) | iz
        else:  # blk == 4
            word_sel = ix >> 1  # in {0, 1}
            bit = ((ix & 1) << 4) | (iy << 2) | iz
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
        word = jnp.sum(
            jnp.where(lane == word_sel[:, :, None], rows, jnp.uint32(0)),
            axis=-1,
        )  # [N, Ke] uint32
        occ = (
            jnp.right_shift(word, bit.astype(jnp.uint32)) & jnp.uint32(1)
        ) > 0

    if Ke != K:
        ts, in_range, occ = ts[:, :K], in_range[:, :K], occ[:, :K]
    raw = occ & in_range
    # rank-select compaction to a PREFIX-dense [N, max_steps] slab: slot j
    # holds the (j+1)-th occupied lattice point. The compact render path
    # (ops/compaction) requires prefix density — the raw occupied pattern
    # has leading/interleaved holes whenever the tight box admits empty
    # cells before the surface — and the narrower slab (max_steps vs
    # lattice_K) shrinks every downstream record. Matches the while-loop
    # walk's output slab exactly.
    #
    # Formulation: pack the [N, K] occupied pattern into ceil(K/32) uint32
    # words, then peel the lowest set bit S times (x & (x-1) clears it;
    # its position comes from the float32 exponent of the isolated bit —
    # exact for powers of two). ~30 dense [N] ops per slot vs the previous
    # [N, K, S] one-hot reduce whose minor S=16 axis lane-padded 8x on TPU
    # (rank-select was the march's measured "select-bound" cost).
    S = max_steps
    nw = -(-K // 32)
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    words = []
    for wi in range(nw):
        in_word = (lane_k >= wi * 32) & (lane_k < (wi + 1) * 32)
        bit = jnp.where(
            raw & in_word,
            jnp.left_shift(
                jnp.uint32(1), (lane_k % 32).astype(jnp.uint32)
            ),
            jnp.uint32(0),
        )
        words.append(jnp.sum(bit, axis=-1, dtype=jnp.uint32))  # [N]

    ks_cols, valid_cols = [], []
    for _ in range(S):
        k_s = jnp.zeros_like(words[0], dtype=jnp.int32)
        taken = jnp.zeros(words[0].shape, bool)
        for wi in range(nw):
            w = words[wi]
            has = (w != jnp.uint32(0)) & ~taken
            low = w & (~w + jnp.uint32(1))  # isolate lowest set bit
            e = (
                jax.lax.shift_right_logical(
                    jax.lax.bitcast_convert_type(
                        low.astype(jnp.float32), jnp.uint32
                    ),
                    jnp.uint32(23),
                ).astype(jnp.int32)
                - 127
            )
            k_s = jnp.where(has, wi * 32 + e, k_s)
            words[wi] = jnp.where(has, w & (w - jnp.uint32(1)), w)
            taken = taken | has
        ks_cols.append(k_s)
        valid_cols.append(taken)
    ks = jnp.stack(ks_cols, axis=-1)  # [N, S]
    valid = jnp.stack(valid_cols, axis=-1)
    ts_sel = t_start[:, None] + ks.astype(jnp.float32) * dt
    return MarchResult(
        ts=jnp.where(valid, ts_sel, 0.0),
        dts=jnp.where(valid, dt, 0.0),
        valid=valid,
        depth_ts=jnp.where(valid, ts_sel + dt, 0.0),
        span=span,
        ks=jnp.where(valid, ks, 0),
        t_start=t_start,
    )


def lattice_span_cells(
    rays_o: jax.Array,
    rays_d: jax.Array,
    occ_grid: jax.Array,
    nears: jax.Array,
    fars: jax.Array,
    *,
    bound: float,
    grid_size: int,
    max_steps: int,
) -> jax.Array:
    """Max lattice steps any ray needs inside the tight occupied box — the
    signal for retuning ``lattice_K`` (scalar int32, on device; fetch lagged
    like the sample-capacity retune)."""
    H = grid_size
    dt = min(2.0 * _SQRT3 / H, 2.0 * _SQRT3 / max_steps)
    tight = _occupied_cell_aabb(occ_grid[0], bound)
    tn, tf = near_far_from_aabb(rays_o, rays_d, tight, 0.0)
    lo = jnp.maximum(tn, nears)
    hi = jnp.minimum(tf, fars)
    span = jnp.where((tn < 1e30) & (hi > lo), hi - lo, 0.0)
    return jnp.ceil(jnp.max(span) / dt).astype(jnp.int32) + 1


def composite_rays(
    sigmas: jax.Array,  # [N, S]
    rgbs: jax.Array,  # [3, N, S]  (channel-major: minor axes stay large on TPU)
    dts: jax.Array,  # [N, S]
    depth_ts: jax.Array,  # [N, S]
    valid: jax.Array,  # [N, S] bool
    ambients: jax.Array | None = None,  # [N, S] (raw per-sample ambient norm)
    T_thresh: float = 1e-4,
) -> dict:
    """Front-to-back alpha compositing over padded slabs.

    Closed-form transmittance: ``1 - alpha_j = exp(-sigma_j dt_j)`` so
    ``T_k = exp(-cumsum_{j<k} sigma_j dt_j)`` — one exclusive cumsum, fully
    parallel over samples (vs the sequential CUDA walk,
    ``kernel_composite_rays_train_forward:604-690``). The ``T < T_thresh``
    early-out becomes a non-differentiable inclusion mask: sample ``k`` is
    accumulated iff ``T_k >= T_thresh`` (the CUDA loop breaks *after*
    accumulating the sample that crosses the threshold). The ambient norm is
    accumulated unweighted over included samples, as in ``cu:659``.

    Returns dict(image [N,3], weights_sum [N], depth [N], ambient_sum [N],
    weights [N,S]).
    """
    sd = jnp.where(valid, sigmas * dts, 0.0)
    cum = jnp.cumsum(sd, axis=-1)
    T_before = jnp.exp(-(cum - sd))  # exclusive cumsum -> T_k
    alpha = 1.0 - jnp.exp(-sd)
    include = jax.lax.stop_gradient(T_before >= T_thresh) & valid
    weights = jnp.where(include, alpha * T_before, 0.0)  # [N, S]

    image = jnp.stack(
        [jnp.sum(weights * rgbs[c], axis=-1) for c in range(3)], axis=-1
    )  # [N, 3]
    weights_sum = jnp.sum(weights, axis=-1)
    depth = jnp.sum(weights * depth_ts, axis=-1)
    out = {
        "image": image,
        "weights_sum": weights_sum,
        "depth": depth,
        "weights": weights,
    }
    if ambients is not None:
        out["ambient_sum"] = jnp.sum(jnp.where(include, ambients, 0.0), axis=-1)
    return out
