"""Morton (Z-order) coding, bitfield packing, and occupancy-grid dilation.

Pure-jnp equivalents of the reference CUDA utilities
(``raymarching/src/raymarching.cu``): ``kernel_morton3D:214`` /
``kernel_morton3D_invert:237`` (bit interleave/deinterleave),
``kernel_packbits:268`` (density grid → uint8 bitfield at a threshold) and
``kernel_morton3D_dilation:304`` (3³ max-pool over the morton-ordered grid).

Note on layout: the TPU renderer indexes its occupancy grid directly by
``(level, x, y, z)`` — morton order was a CUDA cache-locality trick, not a
semantic requirement — but these ops are provided for format compatibility
(e.g. exchanging density bitfields with reference checkpoints) and tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["morton3d", "morton3d_invert", "packbits", "dilate_grid3d"]


def _expand_bits(v: jax.Array) -> jax.Array:
    """Spread the low 10 bits of ``v`` so there are 2 zero bits between each
    (the classic magic-number sequence used by ``raymarching.cu:53-62``)."""
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(coords: jax.Array) -> jax.Array:
    """[..., 3] int coords (each < 1024) → [...] uint32 morton codes."""
    c = coords.astype(jnp.uint32)
    x = _expand_bits(c[..., 0])
    y = _expand_bits(c[..., 1])
    z = _expand_bits(c[..., 2])
    return x | (y << 1) | (z << 2)


def _compact_bits(v: jax.Array) -> jax.Array:
    v = v & jnp.uint32(0x49249249)
    v = (v | (v >> 2)) & jnp.uint32(0xC30C30C3)
    v = (v | (v >> 4)) & jnp.uint32(0x0F00F00F)
    v = (v | (v >> 8)) & jnp.uint32(0xFF0000FF)
    v = (v | (v >> 16)) & jnp.uint32(0x000003FF)
    return v


def morton3d_invert(codes: jax.Array) -> jax.Array:
    """[...] uint32 morton codes → [..., 3] coords."""
    m = codes.astype(jnp.uint32)
    return jnp.stack(
        [_compact_bits(m), _compact_bits(m >> 1), _compact_bits(m >> 2)], axis=-1
    )


def packbits(density: jax.Array, thresh) -> jax.Array:
    """Flat density [..., 8k] → uint8 bitfield [..., k]; bit i of byte j is
    set iff ``density[..., 8j+i] > thresh`` (``raymarching.cu:268-300``)."""
    occ = (density > thresh).astype(jnp.uint8)
    occ = occ.reshape(*occ.shape[:-1], -1, 8)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))
    return jnp.sum(occ * weights, axis=-1).astype(jnp.uint8)


def dilate_grid3d(grid: jax.Array) -> jax.Array:
    """3×3×3 max-pool (stride 1, same padding) over a [..., H, H, H] grid —
    the occupancy dilation of ``raymarching.cu:304-350``."""
    batch_shape = grid.shape[:-3]
    x = grid.reshape((-1,) + grid.shape[-3:])
    out = jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.array(0, x.dtype),
        jax.lax.max,
        window_dimensions=(1, 3, 3, 3),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1), (1, 1)),
    )
    return out.reshape(batch_shape + grid.shape[-3:])
