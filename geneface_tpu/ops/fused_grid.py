"""Fused multi-resolution grid encoder: one row per LEVEL GROUP.

Third (fastest) backend for the RAD-NeRF grid encoders, motivated by the
measured TPU cost surface (``tools/bench_rowops.py``, v5e, M=524k):

=============  ==================================================
op             cost per ROW, flat across row widths 32..128
=============  ==================================================
row gather     ~2 ns   (tables up to ~287k rows)
row scatter    ~6 ns   (tables up to ~16k rows; ~16 ns beyond 39k)
=============  ==================================================

Gathers and scatter-adds are priced per INDEX, not per byte — so the way to
make a multi-level grid encoder fast is to touch FEWER rows, each as wide as
the 128-lane registers allow. This module fuses consecutive levels into
GROUPS: one row per (sample, group) holds the concatenated ``K·C`` corner
features of every level in the group (``K = 2^D`` corners, ``C`` channels),
up to the 128-lane width. The default grouping — level 0 alone (exact dense
interpolation, the low-frequency anchor) plus groups [1..3] and [4..7] —
needs 3 gathers + 3 scatters per sample per grid instead of 8 + 8.

Semantics vs the reference CUDA encoder (``gridencoder.cu:67-84``):

- level 0 (dense): bit-exact block layout of :mod:`geneface_tpu.ops.encoders`
  — parity-copied views of the canonical dense table, continuous
  interpolation, gradients via the slicing transpose.
- fused groups: the row index is the prime-xor hash of the GROUP'S FINEST
  level's base-cell block (+parity), modulo the group's row count. Each
  level still interpolates with its OWN trilinear weights (computed from the
  input), but its corner features live at the finest level's block
  granularity — coarse-level features alias/jump at fine-block boundaries.
  This is the same equal-capacity trade the block backend documents for
  capped levels (``encoders.py BlockGridMeta``), extended to the grouped
  coarse levels, in exchange for the 2.7x cut in row operations. The
  ``reference`` and ``block`` backends remain available for bit-parity and
  checkpoint import.

Parameters are owned by this layout directly (per-group ``[R_g, G·K·C]``
tables + the dense level-0 table); total parameter count matches the block
backend's capped-level budget.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from geneface_tpu.ops.encoders import _HASH_PRIMES, GridMeta

__all__ = [
    "FusedGridMeta",
    "make_fused_grid_meta",
    "init_fused_embeddings",
    "fused_grid_encode",
]


class FusedGridMeta(NamedTuple):
    base: GridMeta
    groups: tuple  # tuple of level-index tuples, e.g. ((0,), (1,2,3), (4,..))
    modes: tuple  # per group: "dense" (single level) | "hash"
    n_rows: tuple  # rows of each group table
    dense_sides: tuple  # per group: entries-per-axis of the dense level (0 if hash)
    dense_bsides: tuple  # per group: blocks-per-axis (0 if hash)
    #: "f32" | "bf16": dtype of the wide [M, G*K*C] gather/product tensors.
    #: bf16 halves the HBM traffic of the elementwise/matmul pipeline (the
    #: step is traffic-bound there); parameters and the grad accumulators
    #: stay f32 (scatter_add_rows always accumulates f32).
    compute: str = "f32"
    #: "same" | "bf16": dtype of the BACKWARD-only wide tensors — the saved
    #: residuals (rows/wexp/w_ax) and the cotangent pipeline (ggexp, upd,
    #: rg). Unlike ``compute`` this never touches forward VALUES (the
    #: round-4 rejected knob); it quantizes only gradient intermediates,
    #: with the scatter still accumulating f32 (round-5 attempt, measured
    #: in docs/perf_notes.md).
    bwd_compute: str = "same"

    @property
    def input_dim(self):
        return self.base.input_dim

    @property
    def level_dim(self):
        return self.base.level_dim

    @property
    def num_levels(self):
        return self.base.num_levels

    @property
    def output_dim(self):
        return self.base.output_dim

    def group_width(self, g: int) -> int:
        K = 1 << self.input_dim
        return len(self.groups[g]) * K * self.level_dim


def _group_compute_dtype(fmeta: "FusedGridMeta", gi: int):
    """Per-group compute dtype: "mixed" keeps dense (low-frequency anchor)
    groups in f32 — their features carry the precision-sensitive base — and
    runs hash groups in bf16."""
    if fmeta.compute == "bf16":
        return jnp.bfloat16
    if fmeta.compute == "mixed" and fmeta.modes[gi] == "hash":
        return jnp.bfloat16
    return jnp.float32


def _level_scale(meta: GridMeta, lvl: int) -> float:
    log2_s = math.log2(meta.per_level_scale)
    return math.exp2(lvl * log2_s) * meta.base_resolution - 1.0


def make_fused_grid_meta(
    meta: GridMeta,
    groups: tuple | None = None,
    single_table: bool = False,
    row_lanes: int = 256,
    compute: str = "f32",
    ungroup_coarse: int = 0,
    bwd_compute: str = "same",
    coarse_run: int = 1,
) -> FusedGridMeta:
    """Default grouping: level 0 alone; remaining levels in runs of up to
    ``row_lanes // (K*C)`` levels. Measured (tools/bench_rowops.py, v5e,
    M=524k): scatter cost/row is flat to W=128 (~6.1 ns) and ~1.6x at
    W=224-256 — one W=224 scatter still beats two W<=128 ones (5.1 ms vs
    7.2 ms), hence the 256-lane default.

    ``row_lanes`` is a CHECKPOINT-LAYOUT version knob: the grouping decides
    the parameter tree's table shapes, so fused checkpoints saved under a
    different grouping only restore with the matching value (config key
    ``fused_row_lanes``; pre-round-2 checkpoints used 128).

    ``single_table=True`` folds level 0 into the hash group too (ONE row
    gather + ONE grad scatter per grid): fastest, but level 0 loses its
    exact dense interpolation — its corner features then alias at the
    finest level's block granularity like every other grouped level."""
    D = meta.input_dim
    K = 1 << D
    C = meta.level_dim
    if single_table and groups is None:
        groups = (tuple(range(meta.num_levels)),)
    if groups is None:
        per_row = max(1, int(row_lanes) // (K * C))
        # ``ungroup_coarse``: give the first N levels after level 0 their own
        # tables (they come out DENSE when side^D fits the per-level budget
        # — exact interpolation instead of aliasing at the finest-in-group
        # block granularity). Round-5 instability suspect knob (config
        # ``fused_ungroup_coarse``); costs one extra gather+scatter per
        # ungrouped level. Changes the checkpoint layout like row_lanes.
        u = max(0, min(int(ungroup_coarse), meta.num_levels - 1))
        # ``coarse_run``: chunk the ungrouped coarse levels in runs of this
        # length instead of singles — a run of 2 keys its coarser level at
        # the next level's cell granularity (one-octave alias gap, vs six
        # octaves in the big group) while halving the extra row-op bill
        # (round-5 quality/cost middle point; see docs/perf_notes.md).
        run = max(1, int(coarse_run))
        lvls = list(range(1, 1 + u))
        singles = tuple(
            tuple(lvls[i : i + run]) for i in range(0, len(lvls), run)
        )
        rest = list(range(1 + u, meta.num_levels))
        groups = ((0,),) + singles + tuple(
            tuple(rest[i : i + per_row]) for i in range(0, len(rest), per_row)
        )
    # the forward concatenates group outputs in order and the backward
    # slices the cotangent as g2[:, g[0]*C:(g[-1]+1)*C]: both require each
    # group to be a contiguous ascending run and groups to cover the levels
    # in order
    flat = tuple(l for g in groups for l in g)
    if flat != tuple(range(meta.num_levels)):
        raise ValueError(
            f"fused grid groups must be contiguous ascending runs covering "
            f"levels 0..{meta.num_levels - 1} in order; got {groups}"
        )
    modes, n_rows, sides, bsides = [], [], [], []
    for g in groups:
        hashmap_size = meta.offsets[g[0] + 1] - meta.offsets[g[0]]
        scale = _level_scale(meta, g[0])
        resolution = int(math.ceil(scale)) + 1
        side = resolution if meta.align_corners else resolution + 1
        if len(g) == 1 and side**D <= hashmap_size:
            modes.append("dense")
            sides.append(side)
            bsides.append(side // 2 + 1)
            n_rows.append(K * (side // 2 + 1) ** D)
        else:
            modes.append("hash")
            sides.append(0)
            bsides.append(0)
            # capacity parity: the group's parameter count equals the sum of
            # its levels' canonical budgets (offsets diff = min(2^cap,
            # side^D) entries x C each), packed into G*K*C-wide rows
            total_entries = sum(
                meta.offsets[l + 1] - meta.offsets[l] for l in g
            )
            n = max(total_entries // (len(g) * K), 1)
            n_rows.append(n)
    if compute not in ("f32", "bf16", "mixed"):
        raise ValueError(
            f"compute must be 'f32', 'bf16' or 'mixed', got {compute!r}"
        )
    if bwd_compute not in ("same", "bf16"):
        raise ValueError(f"bwd_compute must be 'same' or 'bf16', got {bwd_compute!r}")
    return FusedGridMeta(
        base=meta,
        groups=tuple(tuple(g) for g in groups),
        modes=tuple(modes),
        n_rows=tuple(n_rows),
        dense_sides=tuple(sides),
        dense_bsides=tuple(bsides),
        compute=compute,
        bwd_compute=bwd_compute,
    )


def init_fused_embeddings(
    rng: jax.Array, fmeta: FusedGridMeta, std: float = 1e-4
) -> dict:
    """Uniform(-std, std) init (reference ``grid.py:139-141``).

    Dense groups hold the CANONICAL ``[side^D, C]`` table (the fast view is
    materialized per step); hash groups own their ``[R_g, G*K*C]`` rows."""
    params = {}
    for gi, g in enumerate(fmeta.groups):
        key = jax.random.fold_in(rng, gi)
        if fmeta.modes[gi] == "dense":
            shape = (fmeta.dense_sides[gi] ** fmeta.input_dim, fmeta.level_dim)
        else:
            shape = (fmeta.n_rows[gi], fmeta.group_width(gi))
        params[f"group_{gi}"] = jax.random.uniform(
            key, shape, minval=-std, maxval=std, dtype=jnp.float32
        )
    return params


# ----------------------------------------------------------- index math ----
def _base_frac(comps, meta: GridMeta, lvl: int):
    """Per-level integer base + interpolation fraction from clipped inputs."""
    scale = _level_scale(meta, lvl)
    off = 0.0 if meta.align_corners else 0.5
    base, frac = [], []
    for c in comps:
        pos = c * scale + off
        pf = jnp.floor(pos)
        f = pos - pf
        if meta.interpolation == "smoothstep":
            f = f * f * (3.0 - 2.0 * f)
        base.append(pf.astype(jnp.int32))
        frac.append(f)
    return base, frac


def _group_rows(comps, fmeta: FusedGridMeta, gi: int):
    """Row index of group ``gi`` for every sample: dense parity-block
    addressing for dense groups, prime-xor block hash of the group's FINEST
    level for hash groups (``encoders._block_level_rows`` semantics)."""
    meta = fmeta.base
    D = meta.input_dim
    lvl = fmeta.groups[gi][-1] if fmeta.modes[gi] == "hash" else fmeta.groups[gi][0]
    base, _ = _base_frac(comps, meta, lvl)
    pbits = [b & 1 for b in base]
    bcoords = [(b + p) >> 1 for b, p in zip(base, pbits)]
    if fmeta.modes[gi] == "dense":
        bside = fmeta.dense_bsides[gi]
        parity, blk, stride = pbits[0], bcoords[0], bside
        for d in range(1, D):
            parity = parity + (pbits[d] << d)
            blk = blk + bcoords[d] * stride
            stride *= bside
        return parity * (bside**D) + blk
    n = fmeta.n_rows[gi]
    h = bcoords[0].astype(jnp.uint32) * jnp.uint32(_HASH_PRIMES[0])
    for d in range(1, D):
        h = h ^ (bcoords[d].astype(jnp.uint32) * jnp.uint32(_HASH_PRIMES[d]))
    pall = pbits[0]
    for d in range(1, D):
        pall = pall + (pbits[d] << d)
    h = h ^ (pall.astype(jnp.uint32) * jnp.uint32(_HASH_PRIMES[min(D, 6)]))
    return (h % jnp.uint32(n)).astype(jnp.int32)


def _corner_weights(frac, K: int, D: int):
    w = None
    for d in range(D):
        kd = (jax.lax.broadcasted_iota(jnp.int32, (1, K), 1) >> d) & 1
        fd = frac[d][:, None]
        wd = jnp.where(kd == 1, fd, 1.0 - fd)
        w = wd if w is None else w * wd
    return w


def _dense_view(table: jax.Array, fmeta: FusedGridMeta, gi: int, dtype):
    """Canonical dense ``[side^D, C]`` → parity-copied fast view
    ``[K*bside^D, K*C]`` (same construction as ``build_block_tables``)."""
    meta = fmeta.base
    D = meta.input_dim
    K = 1 << D
    C = meta.level_dim
    side = fmeta.dense_sides[gi]
    bside = fmeta.dense_bsides[gi]
    dense = table.reshape((side,) * D + (C,))
    dense_p = jnp.pad(dense, [(1, 2)] * D + [(0, 0)])
    copies = []
    for parity in range(K):
        for corner in range(K):
            starts = [
                1 - ((parity >> (D - 1 - a)) & 1) + ((corner >> (D - 1 - a)) & 1)
                for a in range(D)
            ]
            sl = dense_p[tuple(slice(s, s + 2 * bside - 1, 2) for s in starts)]
            copies.append(sl.reshape(-1, C))
    percorner = jnp.stack(copies, 0).reshape(K, K, -1, C)
    return percorner.transpose(0, 2, 1, 3).reshape(-1, K * C).astype(dtype)


def _dense_view_adjoint(gview: jax.Array, fmeta: FusedGridMeta, gi: int):
    """Adjoint of :func:`_dense_view` — hand-written to avoid the interior
    (dilated) pads XLA emits for the transpose of the stride-2 slices
    (~3.8 ms on v5e vs ~0.2 ms for this formulation).

    The transpose of ``slice(start=s, stride=2)`` into a padded axis is a
    write to positions of parity ``s % 2`` at contiguous offsets ``s // 2`` —
    so in a parity-factored layout ``[2, (P+1)//2]`` per axis every
    contribution is a contiguous edge-pad + add. Accumulate the 64
    (parity, corner) contributions per parity-combo, interleave, crop.
    """
    meta = fmeta.base
    D = meta.input_dim
    K = 1 << D
    C = meta.level_dim
    side = fmeta.dense_sides[gi]
    bside = fmeta.dense_bsides[gi]
    P = side + 3  # padded axis length in _dense_view (pad 1 before, 2 after)
    if P % 2 != 0:
        # even side (align_corners=True metas): the parity-factored layout
        # below assumes odd sides; fall back to the generic linear transpose
        (adj,) = jax.linear_transpose(
            lambda t: _dense_view(t, fmeta, gi, jnp.float32),
            jax.ShapeDtypeStruct((side**D, C), jnp.float32),
        )(gview.astype(jnp.float32))
        return adj
    Ph = P // 2

    g = gview.reshape(K, bside**D, K, C).astype(jnp.float32)
    acc = {}
    for parity in range(K):
        for corner in range(K):
            starts = [
                1 - ((parity >> (D - 1 - a)) & 1) + ((corner >> (D - 1 - a)) & 1)
                for a in range(D)
            ]
            pk = tuple(s % 2 for s in starts)
            offs = [s // 2 for s in starts]
            gs = g[parity, :, corner, :].reshape((bside,) * D + (C,))
            pad = [(o, Ph - o - bside) for o in offs] + [(0, 0)]
            gs = jnp.pad(gs, pad)
            acc[pk] = gs if pk not in acc else acc[pk] + gs
    # assemble [2]*D parity combos -> interleaved padded canonical
    stacked = jnp.stack(
        [acc[tuple((c >> (D - 1 - a)) & 1 for a in range(D))] for c in range(K)]
    ).reshape((2,) * D + (Ph,) * D + (C,))
    # [p0..pD-1, h0..hD-1, C] -> [h0, p0, h1, p1, ..., C]
    perm = []
    for a in range(D):
        perm += [D + a, a]
    perm += [2 * D]
    full = stacked.transpose(perm).reshape((P,) * D + (C,))
    crop = full[tuple(slice(1, side + 1) for _ in range(D))]
    return crop.reshape(side**D, C)


def _prep(inputs, fmeta):
    D = fmeta.input_dim
    if isinstance(inputs, (tuple, list)):
        # per-component 1-D columns: callers that already hold the D
        # coordinates as dense [M] vectors (e.g. the ambient head's width-1
        # outputs) skip the lane-padded [M, D] pack/unpack round-trip
        assert len(inputs) == D, (len(inputs), D)
        prefix = inputs[0].shape
        comps_raw = [c.reshape(-1).astype(jnp.float32) for c in inputs]
    else:
        prefix = inputs.shape[:-1]
        x = inputs.reshape(-1, D).astype(jnp.float32)
        comps_raw = [x[:, d] for d in range(D)]
    oob = jnp.zeros_like(comps_raw[0], dtype=bool)
    for c in comps_raw:
        oob = oob | (c < 0.0) | (c > 1.0)
    comps = [jnp.clip(c, 0.0, 1.0) for c in comps_raw]
    return prefix, comps, oob


import numpy as _np
from functools import lru_cache


@lru_cache(maxsize=None)
def _selectors(G: int, K: int, C: int, D: int):
    """Constant selector/broadcast matrices for the flat lane layouts.

    Everything in the encoder runs on flat 2-D tensors (full lane
    residency; a logical [M, G, K, C] shape puts C=4 on the lanes — 1/32
    utilization) with thin constant 0/1 matmuls doing the structured
    sums/broadcasts on the MXU. Weight math lives at width ``G*K`` (4x
    less HBM traffic than ``G*K*C``) and is expanded across channels once:

    - ``S``    [G*K*C, G*C]: sum over corners k (forward output)
    - ``X``    [G*K, G*K*C]: expand per-corner values across channels
    - ``Ek``   [G, G*K]: broadcast a per-level value over its corners
    - ``bitk`` D x [G*K]: corner bit d at each (level, corner) position
    """
    W = G * K * C
    S = _np.zeros((W, G * C), _np.float32)
    X = _np.zeros((G * K, W), _np.float32)
    Ek = _np.zeros((G, G * K), _np.float32)
    bitk = _np.zeros((D, G * K), _np.float32)
    for g in range(G):
        Ek[g, g * K : (g + 1) * K] = 1.0
        for k in range(K):
            q = g * K + k
            for d in range(D):
                if (k >> d) & 1:
                    bitk[d, q] = 1.0
            for c in range(C):
                p = g * K * C + k * C + c
                S[p, g * C + c] = 1.0
                X[q, p] = 1.0
    # numpy, not jnp: jnp constants materialized inside a trace leak tracers
    # through the lru_cache when reused under a different trace
    return S, X, Ek, bitk


def _axis_weights(fr, Ek, bitk, D):
    """Per-axis interpolation weights at corner granularity: D x [M, G*K]."""
    out = []
    for d in range(D):
        wk = fr[d] @ Ek  # [M, G*K] = per-level frac broadcast over corners
        out.append(bitk[d] * wk + (1.0 - bitk[d]) * (1.0 - wk))
    return out


def _forward(inputs, params, fmeta, save_rows=False, need_input_grad=True):
    meta = fmeta.base
    D, C = meta.input_dim, meta.level_dim
    K = 1 << D
    prefix, comps, oob = _prep(inputs, fmeta)
    M = comps[0].shape[0]

    outs = []
    saved = []
    for gi, g in enumerate(fmeta.groups):
        ct = _group_compute_dtype(fmeta, gi)
        G = len(g)
        S, X, Ek, bitk = _selectors(G, K, C, D)
        table = params[f"group_{gi}"]
        if fmeta.modes[gi] == "dense":
            table = _dense_view(table, fmeta, gi, ct)
        else:
            table = table.astype(ct)
        row = _group_rows(comps, fmeta, gi)
        rows = table[row]  # [M, G*K*C] in compute dtype
        fr, _ = _group_frac(comps, meta, g)  # D x [M, G]
        w_ax = _axis_weights(fr, Ek, bitk, D)
        wk = w_ax[0]
        for d in range(1, D):
            wk = wk * w_ax[d]  # [M, G*K] f32 (small; weight math stays f32)
        wexp = wk.astype(ct) @ X.astype(ct)  # channel expansion, [M, G*K*C]
        if save_rows:
            # residuals: saving wexp (and, for input-grad groups, the
            # per-axis weights) lets the backward skip the whole fr → w_ax →
            # wk → @X recompute chain — each of those narrow [M, G(*K)]
            # tensors lane-pads to 128 and costs an HBM round-trip.
            # bwd_compute="bf16": store them half-width — gradient-side
            # precision only, forward values untouched.
            if fmeta.bwd_compute == "bf16":
                bt = jnp.bfloat16
                saved.append(
                    (
                        row,
                        rows.astype(bt),
                        wexp.astype(bt),
                        tuple(w.astype(bt) for w in w_ax)
                        if need_input_grad
                        else None,
                    )
                )
            else:
                saved.append(
                    (row, rows, wexp, tuple(w_ax) if need_input_grad else None)
                )
        # corner sum on the MXU, f32 accumulation
        outs.append(
            jax.lax.dot_general(
                wexp * rows, S.astype(ct), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )  # [M, G*C]
    out = jnp.concatenate(outs, axis=-1)
    out = jnp.where(oob[:, None], 0.0, out)
    out = out.reshape(*prefix, meta.num_levels * C)
    return (out, saved) if save_rows else out


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_grid_encode(inputs, params, fmeta, need_input_grad=True):
    """Grouped multi-res grid interpolation → [..., L*C].

    ``params``: dict ``group_<i>`` (see :func:`init_fused_embeddings`).
    Differentiable in inputs and params; the backward does ONE local-table
    row scatter per group (the measured cost floor) and reuses the forward's
    gathered rows for the input gradient (no re-gather).

    ``need_input_grad=False`` skips the input-gradient computation entirely
    (returns zeros). Use when the positions are known non-differentiable —
    e.g. the POSITION grid during training, whose sample coordinates are
    built from stop-gradiented rays (the renderer composites in compact
    space and never propagates ray gradients). Measured: the input-grad
    path costs ~12 ms at M=524k even though its maths is "free" —
    [M, 8]-shaped intermediates run at 1/16 lane efficiency.
    """
    return _forward(inputs, params, fmeta)


def _fge_fwd(inputs, params, fmeta, need_input_grad):
    out, saved = _forward(
        inputs, params, fmeta, save_rows=True,
        need_input_grad=need_input_grad,
    )
    return out, (inputs, saved, jax.tree_util.tree_map(
        lambda p: jax.ShapeDtypeStruct(p.shape, p.dtype), params
    ))


def _group_frac(comps, meta: GridMeta, levels):
    """Per-axis interpolation fractions for a run of levels: [M, G] each,
    plus (for smoothstep) the derivative chain factor d(smooth)/d(raw)."""
    fr, chain = [], []
    for d in range(len(comps)):
        cols, ch = [], []
        for lvl in levels:
            scale = _level_scale(meta, lvl)
            off = 0.0 if meta.align_corners else 0.5
            pos = comps[d] * scale + off
            f = pos - jnp.floor(pos)
            if meta.interpolation == "smoothstep":
                ch.append((6.0 * f * (1.0 - f)) * scale)
                f = f * f * (3.0 - 2.0 * f)
            else:
                ch.append(jnp.full_like(f, scale))
            cols.append(f)
        fr.append(jnp.stack(cols, axis=-1))  # [M, G]
        chain.append(jnp.stack(ch, axis=-1))  # [M, G]
    return fr, chain


def _fge_bwd(fmeta, need_input_grad, res, gout):
    from geneface_tpu.ops.scatter import scatter_add_rows

    inputs, saved, specs = res
    meta = fmeta.base
    D, C = meta.input_dim, meta.level_dim
    K = 1 << D
    prefix, comps, oob = _prep(inputs, fmeta)
    M = comps[0].shape[0]
    g2 = gout.reshape(-1, meta.num_levels * C).astype(jnp.float32)
    g2 = jnp.where(oob[:, None], 0.0, g2)

    grad_in_comps = [None] * D
    grads = {}
    for gi, g in enumerate(fmeta.groups):
        ct = _group_compute_dtype(fmeta, gi)
        if fmeta.bwd_compute == "bf16":
            ct = jnp.bfloat16  # cotangent pipeline half-width (grads only)
        row, rows, wexp, w_ax = saved[gi]
        G = len(g)
        S, X, Ek, bitk = _selectors(G, K, C, D)

        gg = g2[:, g[0] * C : (g[-1] + 1) * C].astype(ct)  # [M, G*C]
        ggexp = gg @ S.T.astype(ct)  # [M, W] — cotangent over corners (MXU)
        # params update: upd = w * ggexp, flat for the row scatter
        # (scatter_add_rows accumulates f32 regardless of update dtype);
        # wexp comes from the forward residuals — no weight recompute
        upd = wexp * ggexp

        name = f"group_{gi}"
        if fmeta.modes[gi] == "dense":
            gview = scatter_add_rows(row, upd, fmeta.n_rows[gi])
            gcanon = _dense_view_adjoint(gview, fmeta, gi)
            grads[name] = gcanon.astype(specs[name].dtype)
        else:
            grads[name] = scatter_add_rows(
                row, upd, fmeta.n_rows[gi]
            ).astype(specs[name].dtype)

        if not need_input_grad:
            continue
        # input grads: dcomp_d[m] = sum_{(l,k) in g} chain_d[m,l] * sign_d *
        #   (prod_{dd != d} w_dd) * (sum_c rows * ggexp)
        # — the c-sum (X^T) drops the only full-width tensor to [M, G*K];
        # everything after is ONE fused elementwise+rowsum per axis at corner
        # granularity (f32). For linear interpolation the chain factor is the
        # per-level scale — a compile-time constant row, so no per-sample
        # chain tensors or dw matmuls exist at all.
        rg = jax.lax.dot_general(
            rows * ggexp, X.T.astype(ct), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [M, G*K]
        if meta.interpolation == "linear":
            scales = _np.repeat(
                _np.asarray([_level_scale(meta, l) for l in g], _np.float32), K
            )  # constant [G*K], corner-minor as Ek lays out
            cds = [scales] * D
        else:
            _, chain = _group_frac(comps, meta, g)  # D x [M, G]
            cds = [chain[d] @ Ek for d in range(D)]  # [M, G*K]
        for d in range(D):
            partial = None
            for dd in range(D):
                if dd == d:
                    continue
                partial = w_ax[dd] if partial is None else partial * w_ax[dd]
            sign = 2.0 * bitk[d] - 1.0
            contrib = jnp.sum(rg * (sign * cds[d]) * partial, axis=-1)  # [M]
            grad_in_comps[d] = (
                contrib
                if grad_in_comps[d] is None
                else grad_in_comps[d] + contrib
            )

    columns = isinstance(inputs, (tuple, list))
    if need_input_grad:
        if columns:
            grad_in = tuple(
                jnp.where(oob, 0.0, gc).reshape(prefix)
                for gc in grad_in_comps
            )
        else:
            grad_in = jnp.stack(grad_in_comps, axis=-1)
            grad_in = jnp.where(oob[:, None], 0.0, grad_in).reshape(*prefix, D)
    elif columns:
        grad_in = tuple(jnp.zeros(prefix, jnp.float32) for _ in range(D))
    else:
        grad_in = jnp.zeros(prefix + (D,), jnp.float32)
    # rebuild grads in the primal params' container (dict OR flax FrozenDict)
    grads_tree = jax.tree_util.tree_map_with_path(
        lambda path, spec: grads[path[0].key], specs
    )
    return grad_in, grads_tree


fused_grid_encode.defvjp(_fge_fwd, _fge_bwd)
