"""Input encoders: frequency, spherical-harmonics, and multi-res grid.

TPU-native replacements for the reference CUDA extensions. The freq and SH
encoders are closed-form elementwise math — XLA fuses them into neighbors, so
plain jnp *is* the fast path (SURVEY §2.2: "plain JAX, jit fuses"). The
multi-resolution hash/tiled grid encoder is gather + lerp; its embedding
gradient is the transpose of gather (scatter-add), which JAX derives
automatically.

Semantics match the reference extensions exactly (validated by unit tests
against per-point oracles):

- freq: layout ``[x_0..x_{D-1}, sin(2^0 x_d + phase)...]`` with column order
  (freq, sin/cos, dim) as in ``freqencoder/src/freqencoder.cu:28-57``.
- SH: real spherical harmonics degrees 1..8, hard-coded polynomial expansion
  as in ``shencoder/src/shencoder.cu`` (instant-ngp convention).
- grid: per-level ``scale = 2^(level*log2(per_level_scale)) * H - 1``,
  ``resolution = ceil(scale)+1``, dense stride addressing until
  ``stride > hashmap_size`` then xor-prime hashing, 2^D-corner lerp with
  optional smoothstep, out-of-[0,1] inputs produce zeros
  (``gridencoder/src/gridencoder.cu:51-245``).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "freq_encode",
    "BlockGridMeta",
    "make_block_grid_meta",
    "build_block_tables",
    "block_grid_encode",
    "fast_grid_encode",
    "sh_encode",
    "GridMeta",
    "make_grid_meta",
    "init_grid_embeddings",
    "grid_encode",
    "grid_total_variation",
]


# ----------------------------------------------------------------- freq ----
def freq_encode(x: jax.Array, degree: int) -> jax.Array:
    """NeRF positional encoding ``[x, sin(2^f x), cos(2^f x), ...]``.

    Output layout matches ``freqencoder.cu:46-56``: ``D`` passthrough columns
    followed by column blocks ordered (freq, then sin|cos, then dim):
    ``out[..., D + (2*f + p)*D + d] = sin(2^f * x_d + p*pi/2)``.
    """
    cols = [x]
    for f in range(degree):
        scaled = x * (2.0**f)
        cols.append(jnp.sin(scaled))
        cols.append(jnp.cos(scaled))
    return jnp.concatenate(cols, axis=-1)


def freq_encode_output_dim(input_dim: int, degree: int) -> int:
    return input_dim * (1 + 2 * degree)


# ------------------------------------------------------------------- SH ----
def sh_encode(d: jax.Array, degree: int = 4) -> jax.Array:
    """Real spherical harmonics basis of ``degree`` ∈ [1, 8] on directions.

    ``d``: [..., 3] with components in [-1, 1] (callers normalize).
    Coefficients follow ``shencoder/src/shencoder.cu:44-120`` (instant-ngp
    sign convention). Output dim = degree².
    """
    if not 1 <= degree <= 8:
        raise ValueError(f"sh degree must be in [1, 8], got {degree}")
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xy, xz, yz = x * y, x * z, y * z
    x2, y2, z2 = x * x, y * y, z * z
    x4, y4, z4 = x2 * x2, y2 * y2, z2 * z2
    x6, y6, z6 = x4 * x2, y4 * y2, z4 * z2
    one = jnp.ones_like(x)

    out = [0.28209479177387814 * one]
    if degree >= 2:
        out += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if degree >= 3:
        out += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * z2 - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * x2 - 0.54627421529603959 * y2,
        ]
    if degree >= 4:
        out += [
            0.59004358992664352 * y * (-3.0 * x2 + y2),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * z2),
            0.3731763325901154 * z * (5.0 * z2 - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * z2),
            1.4453057213202769 * z * (x2 - y2),
            0.59004358992664352 * x * (-x2 + 3.0 * y2),
        ]
    if degree >= 5:
        out += [
            2.5033429417967046 * xy * (x2 - y2),
            1.7701307697799304 * yz * (-3.0 * x2 + y2),
            0.94617469575756008 * xy * (7.0 * z2 - 1.0),
            0.66904654355728921 * yz * (3.0 - 7.0 * z2),
            -3.1735664074561294 * z2 + 3.7024941420321507 * z4 + 0.31735664074561293,
            0.66904654355728921 * xz * (3.0 - 7.0 * z2),
            0.47308734787878004 * (x2 - y2) * (7.0 * z2 - 1.0),
            1.7701307697799304 * xz * (-x2 + 3.0 * y2),
            -3.7550144126950569 * x2 * y2 + 0.62583573544917614 * x4
            + 0.62583573544917614 * y4,
        ]
    if degree >= 6:
        out += [
            0.65638205684017015 * y * (10.0 * x2 * y2 - 5.0 * x4 - y4),
            8.3026492595241645 * xy * z * (x2 - y2),
            -0.48923829943525038 * y * (3.0 * x2 - y2) * (9.0 * z2 - 1.0),
            4.7935367849733241 * xy * z * (3.0 * z2 - 1.0),
            0.45294665119569694 * y * (14.0 * z2 - 21.0 * z4 - 1.0),
            0.1169503224534236 * z * (-70.0 * z2 + 63.0 * z4 + 15.0),
            0.45294665119569694 * x * (14.0 * z2 - 21.0 * z4 - 1.0),
            2.3967683924866621 * z * (x2 - y2) * (3.0 * z2 - 1.0),
            -0.48923829943525038 * x * (x2 - 3.0 * y2) * (9.0 * z2 - 1.0),
            2.0756623148810411 * z * (-6.0 * x2 * y2 + x4 + y4),
            0.65638205684017015 * x * (10.0 * x2 * y2 - x4 - 5.0 * y4),
        ]
    if degree >= 7:
        out += [
            1.3663682103838286 * xy * (-10.0 * x2 * y2 + 3.0 * x4 + 3.0 * y4),
            2.3666191622317521 * yz * (10.0 * x2 * y2 - 5.0 * x4 - y4),
            2.0182596029148963 * xy * (x2 - y2) * (11.0 * z2 - 1.0),
            -0.92120525951492349 * yz * (3.0 * x2 - y2) * (11.0 * z2 - 3.0),
            0.92120525951492349 * xy * (-18.0 * z2 + 33.0 * z4 + 1.0),
            0.58262136251873131 * yz * (30.0 * z2 - 33.0 * z4 - 5.0),
            6.6747662381009842 * z2 - 20.024298714302954 * z4
            + 14.684485723822165 * z6 - 0.31784601133814211,
            0.58262136251873131 * xz * (30.0 * z2 - 33.0 * z4 - 5.0),
            0.46060262975746175 * (x2 - y2)
            * (11.0 * z2 * (3.0 * z2 - 1.0) - 7.0 * z2 + 1.0),
            -0.92120525951492349 * xz * (x2 - 3.0 * y2) * (11.0 * z2 - 3.0),
            0.50456490072872406 * (11.0 * z2 - 1.0) * (-6.0 * x2 * y2 + x4 + y4),
            2.3666191622317521 * xz * (10.0 * x2 * y2 - x4 - 5.0 * y4),
            10.247761577878714 * x2 * y4 - 10.247761577878714 * x4 * y2
            + 0.6831841051919143 * x6 - 0.6831841051919143 * y6,
        ]
    if degree >= 8:
        out += [
            0.70716273252459627 * y * (-21.0 * x2 * y4 + 35.0 * x4 * y2 - 7.0 * x6 + y6),
            5.2919213236038001 * xy * z * (-10.0 * x2 * y2 + 3.0 * x4 + 3.0 * y4),
            -0.51891557872026028 * y * (13.0 * z2 - 1.0)
            * (-10.0 * x2 * y2 + 5.0 * x4 + y4),
            4.1513246297620823 * xy * z * (x2 - y2) * (13.0 * z2 - 3.0),
            -0.15645893386229404 * y * (3.0 * x2 - y2)
            * (13.0 * z2 * (11.0 * z2 - 3.0) - 27.0 * z2 + 3.0),
            0.44253269244498261 * xy * z * (-110.0 * z2 + 143.0 * z4 + 15.0),
            0.090331607582517306 * y * (-135.0 * z2 + 495.0 * z4 - 429.0 * z6 + 5.0),
            0.068284276912004949 * z * (315.0 * z2 - 693.0 * z4 + 429.0 * z6 - 35.0),
            0.090331607582517306 * x * (-135.0 * z2 + 495.0 * z4 - 429.0 * z6 + 5.0),
            0.07375544874083044 * z * (x2 - y2)
            * (143.0 * z2 * (3.0 * z2 - 1.0) - 187.0 * z2 + 45.0),
            -0.15645893386229404 * x * (x2 - 3.0 * y2)
            * (13.0 * z2 * (11.0 * z2 - 3.0) - 27.0 * z2 + 3.0),
            1.0378311574405206 * z * (13.0 * z2 - 3.0) * (-6.0 * x2 * y2 + x4 + y4),
            -0.51891557872026028 * x * (13.0 * z2 - 1.0)
            * (-10.0 * x2 * y2 + x4 + 5.0 * y4),
            2.6459606618019 * z * (15.0 * x2 * y4 - 15.0 * x4 * y2 + x6 - y6),
            0.70716273252459627 * x * (-35.0 * x2 * y4 + 21.0 * x4 * y2 - x6 + 7.0 * y6),
        ]
    return jnp.stack(out, axis=-1)


# ----------------------------------------------------------------- grid ----
_HASH_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737)


class GridMeta(NamedTuple):
    """Static (trace-time) metadata for a multi-resolution grid encoder."""

    input_dim: int
    num_levels: int
    level_dim: int
    base_resolution: int
    per_level_scale: float
    offsets: tuple  # [L+1] int, starts of each level in the embedding table
    gridtype: str  # "hash" | "tiled"
    align_corners: bool
    interpolation: str  # "linear" | "smoothstep"

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    @property
    def n_entries(self) -> int:
        return self.offsets[-1]


def make_grid_meta(
    input_dim: int = 3,
    num_levels: int = 16,
    level_dim: int = 2,
    base_resolution: int = 16,
    log2_hashmap_size: int = 19,
    desired_resolution: int | None = None,
    per_level_scale: float = 2.0,
    gridtype: str = "hash",
    align_corners: bool = False,
    interpolation: str = "linear",
) -> GridMeta:
    """Level layout identical to the reference (``grid.py:118-131``):
    per-level entry count = min(2^log2_hashmap_size, resolution^D) rounded up
    to a multiple of 8."""
    if desired_resolution is not None:
        per_level_scale = float(
            np.exp2(np.log2(desired_resolution / base_resolution) / max(num_levels - 1, 1))
        )
    max_params = 2**log2_hashmap_size
    offsets = [0]
    for lvl in range(num_levels):
        res = int(np.ceil(base_resolution * per_level_scale**lvl))
        side = res if align_corners else res + 1
        n = min(max_params, side**input_dim)
        n = int(np.ceil(n / 8) * 8)
        offsets.append(offsets[-1] + n)
    return GridMeta(
        input_dim=input_dim,
        num_levels=num_levels,
        level_dim=level_dim,
        base_resolution=base_resolution,
        per_level_scale=per_level_scale,
        offsets=tuple(offsets),
        gridtype=gridtype,
        align_corners=align_corners,
        interpolation=interpolation,
    )


def init_grid_embeddings(rng: jax.Array, meta: GridMeta, std: float = 1e-4) -> jax.Array:
    """Uniform(-std, std) init as the reference (``grid.py:139-141``)."""
    return jax.random.uniform(
        rng, (meta.n_entries, meta.level_dim), minval=-std, maxval=std,
        dtype=jnp.float32,
    )


def _corner_index_1d(
    comps: list,  # D arrays [M] uint32 integer corner coords (per dimension)
    meta: GridMeta,
    resolution: int,
    hashmap_size: int,
) -> jax.Array:
    """Global (per-level) entry index for one corner; mirrors
    ``get_grid_index`` (``gridencoder.cu:67-84``). All math on 1-D arrays —
    TPU tiling pads the minor axis to 128, so [M, D] layouts with D=2/3 waste
    up to 42× memory; per-component [M] arrays are tight."""
    D = meta.input_dim
    side = resolution if meta.align_corners else resolution + 1
    # dense stride addressing, including dim d only while stride <= hashmap_size
    stride = 1
    index = jnp.zeros_like(comps[0])
    for d in range(D):
        if stride > hashmap_size:
            break
        index = index + comps[d] * jnp.uint32(stride)
        stride *= side
    if meta.gridtype == "hash" and stride > hashmap_size:
        index = comps[0] * jnp.uint32(_HASH_PRIMES[0])
        for d in range(1, D):
            index = index ^ (comps[d] * jnp.uint32(_HASH_PRIMES[d]))
    return index % jnp.uint32(hashmap_size)


def grid_encode(
    inputs: jax.Array,  # [..., D] in [0, 1]
    embeddings: jax.Array,  # [n_entries, C]
    meta: GridMeta,
) -> jax.Array:
    """Multi-resolution grid interpolation → [..., L*C].

    Out-of-range inputs yield zeros for that point (``gridencoder.cu:112-135``).
    Differentiable in both ``inputs`` and ``embeddings`` (the embedding grad is
    the gather transpose = scatter-add the CUDA backward implements with
    atomicAdd, ``gridencoder.cu:248-341``).

    TPU layout: all per-point intermediates are 1-D [M] arrays (per dimension
    / per channel) gathered from the *flattened* table, and the per-level
    results are accumulated dim-major [L*C, M] before one final transpose —
    no [M, small] temporaries that XLA would pad 42×.
    """
    D = meta.input_dim
    C = meta.level_dim
    prefix = inputs.shape[:-1]
    x = inputs.reshape(-1, D).astype(jnp.float32)
    comps_in = [x[:, d] for d in range(D)]  # D × [M]

    oob = jnp.zeros_like(comps_in[0], dtype=bool)
    for c in comps_in:
        oob = oob | (c < 0.0) | (c > 1.0)
    comps_clip = [jnp.clip(c, 0.0, 1.0) for c in comps_in]

    emb_flat = embeddings.reshape(-1)  # [n_entries * C]

    log2_s = math.log2(meta.per_level_scale)
    rows = []  # L*C arrays of [M]
    for lvl in range(meta.num_levels):
        scale = math.exp2(lvl * log2_s) * meta.base_resolution - 1.0
        resolution = int(math.ceil(scale)) + 1
        hashmap_size = meta.offsets[lvl + 1] - meta.offsets[lvl]
        off = 0.0 if meta.align_corners else 0.5

        base, frac = [], []
        for c in comps_clip:
            pos = c * scale + off
            pf = jnp.floor(pos)
            f = pos - pf
            if meta.interpolation == "smoothstep":
                f = f * f * (3.0 - 2.0 * f)
            base.append(pf.astype(jnp.uint32))
            frac.append(f)

        acc = [jnp.zeros_like(comps_clip[0]) for _ in range(C)]
        for corner in range(1 << D):
            local = []
            w = None
            for d in range(D):
                if (corner >> d) & 1:
                    local.append(base[d] + jnp.uint32(1))
                    wd = frac[d]
                else:
                    local.append(base[d])
                    wd = 1.0 - frac[d]
                w = wd if w is None else w * wd
            idx = _corner_index_1d(local, meta, resolution, hashmap_size)
            flat = (idx + jnp.uint32(meta.offsets[lvl])).astype(jnp.int32) * C
            for ch in range(C):
                acc[ch] = acc[ch] + w * emb_flat[flat + ch]
        rows.extend(acc)

    out = jnp.stack(rows)  # [L*C, M], minor axis M: tight tiling
    out = jnp.where(oob[None, :], 0.0, out).T  # [M, L*C]
    return out.reshape(*prefix, meta.num_levels * C)


def grid_total_variation(
    embeddings: jax.Array,
    meta: GridMeta,
    rng: jax.Array,
    n_samples: int = 1 << 14,
) -> jax.Array:
    """Stochastic total-variation regularizer over the grid (capability of
    ``gridencoder.cu:506`` / ``grid.py:165``): mean squared difference between
    neighboring cells at random sites, summed over levels. Returned as a
    scalar loss (differentiable) rather than a raw grad injection."""
    D = meta.input_dim
    x = jax.random.uniform(rng, (n_samples, D))
    comps = [x[:, d] for d in range(D)]
    log2_s = math.log2(meta.per_level_scale)
    loss = jnp.float32(0.0)
    for lvl in range(meta.num_levels):
        scale = math.exp2(lvl * log2_s) * meta.base_resolution - 1.0
        resolution = int(math.ceil(scale)) + 1
        hashmap_size = meta.offsets[lvl + 1] - meta.offsets[lvl]
        base = [jnp.floor(c * scale).astype(jnp.uint32) for c in comps]
        idx0 = _corner_index_1d(base, meta, resolution, hashmap_size)
        v0 = embeddings[(idx0 + jnp.uint32(meta.offsets[lvl])).astype(jnp.int32)]
        for d in range(D):
            shifted = list(base)
            shifted[d] = base[d] + jnp.uint32(1)
            idx1 = _corner_index_1d(shifted, meta, resolution, hashmap_size)
            v1 = embeddings[(idx1 + jnp.uint32(meta.offsets[lvl])).astype(jnp.int32)]
            loss = loss + jnp.mean((v1 - v0) ** 2)
    return loss


# ------------------------------------------------- TPU block-layout encoder ----
class BlockGridMeta(NamedTuple):
    """Static metadata for the TPU *block-row* grid encoder.

    Motivation (measured on v5e): XLA TPU gathers cost per-INDEX (~6-7 ns),
    not per-byte — a [1M] scalar gather costs ~7 ms while a [1M, 16]-channel
    row gather costs ~2 ms. The reference encoder needs ``2^D`` scalar
    gathers per (point, level) (``gridencoder.cu:160-190``); this layout
    needs ONE wide row gather per (point, level): every row of the fast
    table holds all ``2^D`` corner features of one cell.

    Two per-level modes:
    - ``dense``: the level is uncapped (``side^D`` entries fit the hashmap
      budget). The fast table holds, for each base-parity p ∈ {0,1}^D, a
      shifted copy such that row (p, block) stores corners ``base + k`` of
      the unique base with that parity mapping to the block. Copies are
      materialized from the canonical ``[n_entries, C]`` parameters by
      STRIDED SLICING inside the jitted step — bandwidth-bound (~100s of MB,
      <1 ms), no gathers — so interpolation is bit-identical to the
      reference semantics (continuity included) and gradients flow to the
      canonical table.
    - ``block_hash``: capped levels. The canonical parameter region is
      reinterpreted as ``[hashmap_size / 2^D, 2^D * C]`` rows addressed by a
      prime-xor hash of (block coords, base parity). Same parameter count as
      the reference; aliasing occurs at block rather than entry granularity
      and interpolation may be discontinuous across cells that alias
      differently — an equal-capacity TPU-native trade documented here
      (diverges from ``gridencoder.cu:67-84``).

    Canonical parameters are IDENTICAL in shape/layout to :class:`GridMeta`
    (``[n_entries, C]``), so checkpoints are interchangeable between the
    reference-semantics and fast encoders.
    """

    base: GridMeta
    modes: tuple  # per level: "dense" | "block_hash"
    level_sides: tuple  # entries-per-axis of each level
    block_sides: tuple  # blocks per axis (dense levels)
    row_offsets: tuple  # start row of each level in the fast table
    n_hash_rows: tuple  # rows for block_hash levels (hashmap // 2^D)

    @property
    def input_dim(self):
        return self.base.input_dim

    @property
    def num_levels(self):
        return self.base.num_levels

    @property
    def level_dim(self):
        return self.base.level_dim

    @property
    def output_dim(self):
        return self.base.output_dim

    @property
    def row_width(self):
        return (1 << self.input_dim) * self.level_dim

    @property
    def total_rows(self):
        return self.row_offsets[-1]


def make_block_grid_meta(meta: GridMeta) -> BlockGridMeta:
    D = meta.input_dim
    K = 1 << D
    log2_s = math.log2(meta.per_level_scale)
    modes, sides, bsides, offs, nrows = [], [], [], [0], []
    for lvl in range(meta.num_levels):
        scale = math.exp2(lvl * log2_s) * meta.base_resolution - 1.0
        resolution = int(math.ceil(scale)) + 1
        side = resolution if meta.align_corners else resolution + 1
        hashmap_size = meta.offsets[lvl + 1] - meta.offsets[lvl]
        sides.append(side)
        if side**D <= hashmap_size:  # uncapped -> dense strided copies
            modes.append("dense")
            bside = side // 2 + 1
            bsides.append(bside)
            nrows.append(0)
            offs.append(offs[-1] + K * bside**D)
        else:
            modes.append("block_hash")
            bsides.append(0)
            n = max(hashmap_size // K, 1)
            nrows.append(n)
            offs.append(offs[-1] + n)
    return BlockGridMeta(
        base=meta,
        modes=tuple(modes),
        level_sides=tuple(sides),
        block_sides=tuple(bsides),
        row_offsets=tuple(offs),
        n_hash_rows=tuple(nrows),
    )


def build_block_tables(
    embeddings: jax.Array, bmeta: BlockGridMeta, dtype=jnp.bfloat16
) -> jax.Array:
    """Canonical ``[n_entries, C]`` → fast table ``[total_rows, 2^D * C]``.

    Dense levels: strided-slice parity copies (no gathers). Block-hash
    levels: reshape of the canonical region. Differentiable; runs inside the
    train step every call (bandwidth-bound)."""
    meta = bmeta.base
    D = meta.input_dim
    K = 1 << D
    C = meta.level_dim
    parts = []
    for lvl in range(meta.num_levels):
        region = embeddings[meta.offsets[lvl] : meta.offsets[lvl + 1]]
        if bmeta.modes[lvl] == "block_hash":
            n = bmeta.n_hash_rows[lvl]
            parts.append(region[: n * K].reshape(n, K * C))
            continue
        side = bmeta.level_sides[lvl]
        bside = bmeta.block_sides[lvl]
        # canonical entry index = sum_d coord_d * side^d (dim 0 fastest,
        # get_grid_index stride order), so the reshaped axes are reversed:
        # dense[c_{D-1}, ..., c_0]
        dense = region[: side**D].reshape((side,) * D + (C,))
        # pad by 1 at both ends of every axis so 2*bc - p + k stays in range
        dense_p = jnp.pad(dense, [(1, 2)] * D + [(0, 0)])
        copies = []
        for parity in range(K):
            for corner in range(K):
                # start = -p + k shifted by the +1 pad; axis a <-> dim D-1-a
                starts = [
                    1 - ((parity >> (D - 1 - a)) & 1) + ((corner >> (D - 1 - a)) & 1)
                    for a in range(D)
                ]
                sl = dense_p[
                    tuple(slice(s, s + 2 * bside - 1, 2) for s in starts)
                ]  # [bside, ...] after ::2 (2*bside-1 span -> bside points)
                copies.append(sl.reshape(-1, C))
        # layout rows as (parity, block) x (corner-major channels)
        percorner = jnp.stack(copies, 0).reshape(K, K, -1, C)  # [p, k, blocks, C]
        rows = percorner.transpose(0, 2, 1, 3).reshape(-1, K * C)
        parts.append(rows)
    return jnp.concatenate(parts, axis=0).astype(dtype)


def block_grid_encode(
    inputs: jax.Array,  # [..., D] in [0, 1]
    block_tables: jax.Array,  # [total_rows, 2^D * C]
    bmeta: BlockGridMeta,
) -> jax.Array:
    """One wide row-gather per (point, level) → [..., L*C]."""
    meta = bmeta.base
    D = meta.input_dim
    C = meta.level_dim
    K = 1 << D
    prefix = inputs.shape[:-1]
    x = inputs.reshape(-1, D).astype(jnp.float32)
    comps = [x[:, d] for d in range(D)]
    oob = jnp.zeros_like(comps[0], dtype=bool)
    for c in comps:
        oob = oob | (c < 0.0) | (c > 1.0)
    comps = [jnp.clip(c, 0.0, 1.0) for c in comps]

    log2_s = math.log2(meta.per_level_scale)
    outs = []
    for lvl in range(meta.num_levels):
        scale = math.exp2(lvl * log2_s) * meta.base_resolution - 1.0
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
        pbits = [b & 1 for b in base]
        bcoords = [(b + p) >> 1 for b, p in zip(base, pbits)]

        if bmeta.modes[lvl] == "dense":
            bside = bmeta.block_sides[lvl]
            parity = pbits[0]
            blk = bcoords[0]
            stride = bside
            for d in range(1, D):
                parity = parity + (pbits[d] << d)
                blk = blk + bcoords[d] * stride
                stride *= bside
            row = bmeta.row_offsets[lvl] + parity * (bside**D) + blk
        else:
            n = bmeta.n_hash_rows[lvl]
            h = bcoords[0].astype(jnp.uint32) * jnp.uint32(_HASH_PRIMES[0])
            for d in range(1, D):
                h = h ^ (bcoords[d].astype(jnp.uint32) * jnp.uint32(_HASH_PRIMES[d]))
            pall = pbits[0]
            for d in range(1, D):
                pall = pall + (pbits[d] << d)
            h = h ^ (pall.astype(jnp.uint32) * jnp.uint32(_HASH_PRIMES[min(D, 6)]))
            row = bmeta.row_offsets[lvl] + (h % jnp.uint32(n)).astype(jnp.int32)

        rows = block_tables[row].astype(jnp.float32).reshape(-1, K, C)
        # corner k stores coords base + k -> standard lerp weights
        w = None
        for d in range(D):
            kd = (jax.lax.broadcasted_iota(jnp.int32, (1, K), 1) >> d) & 1
            fd = frac[d][:, None]
            wd = jnp.where(kd == 1, fd, 1.0 - fd)
            w = wd if w is None else w * wd
        outs.append(jnp.einsum("mk,mkc->mc", w, rows))

    out = jnp.concatenate(outs, axis=-1)
    out = jnp.where(oob[:, None], 0.0, out)
    return out.reshape(*prefix, meta.num_levels * C)


def _block_level_rows(comps, bmeta, lvl):
    """Shared index math: per-level (base, frac, row-index) for the fast
    table. comps: list of D clipped [M] arrays."""
    meta = bmeta.base
    D = meta.input_dim
    log2_s = math.log2(meta.per_level_scale)
    scale = math.exp2(lvl * log2_s) * meta.base_resolution - 1.0
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
    pbits = [b & 1 for b in base]
    bcoords = [(b + p) >> 1 for b, p in zip(base, pbits)]
    if bmeta.modes[lvl] == "dense":
        bside = bmeta.block_sides[lvl]
        parity, blk, stride = pbits[0], bcoords[0], bside
        for d in range(1, D):
            parity = parity + (pbits[d] << d)
            blk = blk + bcoords[d] * stride
            stride *= bside
        row = bmeta.row_offsets[lvl] + parity * (bside**D) + blk
        row_local = None
    else:
        n = bmeta.n_hash_rows[lvl]
        h = bcoords[0].astype(jnp.uint32) * jnp.uint32(_HASH_PRIMES[0])
        for d in range(1, D):
            h = h ^ (bcoords[d].astype(jnp.uint32) * jnp.uint32(_HASH_PRIMES[d]))
        pall = pbits[0]
        for d in range(1, D):
            pall = pall + (pbits[d] << d)
        h = h ^ (pall.astype(jnp.uint32) * jnp.uint32(_HASH_PRIMES[min(D, 6)]))
        row_local = (h % jnp.uint32(n)).astype(jnp.int32)
        row = bmeta.row_offsets[lvl] + row_local
    return base, frac, pbits, bcoords, row, row_local, scale


def _corner_weights(frac, K, D):
    """Trilinear corner weights → [M, K]; corner bit d selects frac vs 1-frac."""
    w = None
    for d in range(D):
        kd = (jax.lax.broadcasted_iota(jnp.int32, (1, K), 1) >> d) & 1
        fd = frac[d][:, None]
        wd = jnp.where(kd == 1, fd, 1.0 - fd)
        w = wd if w is None else w * wd
    return w


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def fast_grid_encode(inputs, embeddings, bmeta):
    """Block-layout grid encode with a per-level local-table scatter backward.

    Forward = ``build_block_tables`` + ``block_grid_encode`` (one wide
    row-gather per level — fast on TPU). The backward replaces naive
    autodiff's per-level scatter into the FULL fast table (R≈170k rows,
    ~17 ms each on v5e — XLA scatter cost grows with table size) with a
    scatter into each level's LOCAL table (R≤~40k, 6.5-17 ms), then maps the
    fast-table cotangent back to the canonical ``[n_entries, C]`` parameters
    through the linear transpose of ``build_block_tables`` (pure
    pad/slice/reshape adjoints — bandwidth-bound). Accumulation semantics
    match the reference CUDA backward (``gridencoder.cu:248-341``).
    """
    tables = build_block_tables(embeddings, bmeta)
    return block_grid_encode(inputs, tables, bmeta)


def _fge_fwd(inputs, embeddings, bmeta):
    tables = build_block_tables(embeddings, bmeta)
    out = block_grid_encode(inputs, tables, bmeta)
    return out, (inputs, tables, jax.ShapeDtypeStruct(embeddings.shape, embeddings.dtype))


def _fge_bwd(bmeta, res, g):
    from geneface_tpu.ops.scatter import scatter_add_rows

    inputs, tables, emb_spec = res
    meta = bmeta.base
    D = meta.input_dim
    C = meta.level_dim
    K = 1 << D
    prefix = inputs.shape[:-1]
    x = inputs.reshape(-1, D).astype(jnp.float32)
    comps_raw = [x[:, d] for d in range(D)]
    oob = jnp.zeros_like(comps_raw[0], dtype=bool)
    for c in comps_raw:
        oob = oob | (c < 0.0) | (c > 1.0)
    comps = [jnp.clip(c, 0.0, 1.0) for c in comps_raw]
    g2 = g.reshape(-1, meta.num_levels * C).astype(jnp.float32)
    g2 = jnp.where(oob[:, None], 0.0, g2)

    grad_in_comps = [jnp.zeros_like(comps[0]) for _ in range(D)]
    gtab_parts = []  # per-level [rows_lvl, K*C] cotangents of the fast table

    for lvl in range(meta.num_levels):
        base, frac, pbits, bcoords, row, row_local, scale = _block_level_rows(
            comps, bmeta, lvl
        )
        g_lvl = g2[:, lvl * C : (lvl + 1) * C]  # [M, C]
        w = _corner_weights(frac, K, D)  # [M, K]

        # ---- table grads: one local-table row scatter per level ----
        rows_lvl = bmeta.row_offsets[lvl + 1] - bmeta.row_offsets[lvl]
        local_row = row - bmeta.row_offsets[lvl]
        upd = (w[:, :, None] * g_lvl[:, None, :]).reshape(-1, K * C)
        gtab_parts.append(scatter_add_rows(local_row, upd, rows_lvl))

        # ---- input grads: dy/dfrac_d = sum_k (±prod_{d'≠d} w_d') * v_k·g ----
        rows_v = tables[row].astype(jnp.float32).reshape(-1, K, C)
        vg = jnp.einsum("mkc,mc->mk", rows_v, g_lvl)  # [M, K]
        for d in range(D):
            kd = (jax.lax.broadcasted_iota(jnp.int32, (1, K), 1) >> d) & 1
            sign = jnp.where(kd == 1, 1.0, -1.0)
            wpartial = None
            for dd in range(D):
                if dd == d:
                    continue
                kdd = (jax.lax.broadcasted_iota(jnp.int32, (1, K), 1) >> dd) & 1
                fdd = frac[dd][:, None]
                wdd = jnp.where(kdd == 1, fdd, 1.0 - fdd)
                wpartial = wdd if wpartial is None else wpartial * wdd
            terms = sign * (wpartial if wpartial is not None else 1.0) * vg
            dw = jnp.sum(terms, axis=-1)
            if meta.interpolation == "smoothstep":
                # frac was smoothstepped; d smooth/d raw = 6 f (1-f) on the
                # raw fraction — recompute raw fraction
                pos = comps[d] * scale + (0.0 if meta.align_corners else 0.5)
                raw_f = pos - jnp.floor(pos)
                dw = dw * (6.0 * raw_f * (1.0 - raw_f))
            grad_in_comps[d] = grad_in_comps[d] + dw * scale

    # fast-table cotangent -> canonical params via the linear transpose of
    # build_block_tables (slicing/stack/transpose adjoints; f32 throughout)
    gtab = jnp.concatenate(gtab_parts, axis=0)
    transpose_fn = jax.linear_transpose(
        lambda e: build_block_tables(e, bmeta, dtype=jnp.float32),
        jax.ShapeDtypeStruct(emb_spec.shape, jnp.float32),
    )
    (grad_emb,) = transpose_fn(gtab)

    grad_in = jnp.stack(grad_in_comps, axis=-1)
    grad_in = jnp.where(oob[:, None], 0.0, grad_in).reshape(*prefix, D)
    return grad_in, grad_emb.astype(emb_spec.dtype)


fast_grid_encode.defvjp(_fge_fwd, _fge_bwd)


# ------------------------------------------------------------- dispatch ----
def get_encoder(
    encoding: str,
    input_dim: int = 3,
    multires: int = 6,
    degree: int = 4,
    num_levels: int = 16,
    level_dim: int = 2,
    base_resolution: int = 16,
    log2_hashmap_size: int = 19,
    desired_resolution: int = 2048,
    align_corners: bool = False,
    interpolation: str = "linear",
    **kwargs,
):
    """Encoder dispatch with the reference's surface
    (``encoders/encoding.py:6-36``): returns ``(encode_fn, output_dim,
    init_fn)``. ``init_fn(rng)`` produces the parameter pytree for grid
    encoders (None for the parameterless ones); ``encode_fn(x, params=None)``
    is jit-compatible.

    encoding ∈ {"None", "frequency", "spherical_harmonics", "hashgrid",
    "tiledgrid"}.
    """
    if encoding == "None":
        return (lambda x, params=None: x), input_dim, None
    if encoding == "frequency":
        return (
            lambda x, params=None: freq_encode(x, multires),
            freq_encode_output_dim(input_dim, multires),
            None,
        )
    if encoding == "spherical_harmonics":
        return (lambda x, params=None: sh_encode(x, degree)), degree**2, None
    if encoding in ("hashgrid", "tiledgrid"):
        meta = make_grid_meta(
            input_dim=input_dim,
            num_levels=num_levels,
            level_dim=level_dim,
            base_resolution=base_resolution,
            log2_hashmap_size=log2_hashmap_size,
            desired_resolution=desired_resolution,
            gridtype="hash" if encoding == "hashgrid" else "tiled",
            align_corners=align_corners,
            interpolation=interpolation,
        )
        return (
            lambda x, params: grid_encode(x, params, meta),
            meta.output_dim,
            lambda rng: init_grid_embeddings(rng, meta),
        )
    raise NotImplementedError(
        "Unknown encoding mode, choose from "
        "[None, frequency, spherical_harmonics, hashgrid, tiledgrid]"
    )
