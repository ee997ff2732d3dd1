"""Ops tests: encoders vs per-point numpy oracles of the CUDA semantics."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geneface_tpu.ops import (
    freq_encode,
    grid_encode,
    init_grid_embeddings,
    make_grid_meta,
    sh_encode,
    trunc_exp,
)

# ------------------------------------------------------------------ freq ----
def test_freq_encode_layout():
    x = np.array([[0.3, -1.2]], dtype=np.float32)
    out = np.asarray(freq_encode(jnp.asarray(x), degree=3))
    D, deg = 2, 3
    assert out.shape == (1, D * (1 + 2 * deg))
    # oracle per freqencoder.cu:46-56
    expect = np.zeros(D * (1 + 2 * deg), np.float32)
    expect[:D] = x[0]
    for c in range(D, D * (1 + 2 * deg)):
        col = c // D - 1
        d = c % D
        f = col // 2
        phase = (col % 2) * (math.pi / 2)
        expect[c] = math.sin(x[0, d] * (2.0**f) + phase)
    np.testing.assert_allclose(out[0], expect, atol=1e-6)


def test_freq_encode_grad():
    g = jax.grad(lambda x: freq_encode(x, 2).sum())(jnp.array([0.5, 0.1]))
    assert np.all(np.isfinite(np.asarray(g)))


# -------------------------------------------------------------------- SH ----
def _sh_oracle_deg4(x, y, z):
    """First 16 real SH terms per shencoder.cu:44-70."""
    xy, xz, yz = x * y, x * z, y * z
    x2, y2, z2 = x * x, y * y, z * z
    return np.array(
        [
            0.28209479177387814,
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * z2 - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * x2 - 0.54627421529603959 * y2,
            0.59004358992664352 * y * (-3.0 * x2 + y2),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * z2),
            0.3731763325901154 * z * (5.0 * z2 - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * z2),
            1.4453057213202769 * z * (x2 - y2),
            0.59004358992664352 * x * (-x2 + 3.0 * y2),
        ]
    )


def test_sh_encode_degree4():
    rng = np.random.RandomState(1)
    d = rng.randn(5, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    out = np.asarray(sh_encode(jnp.asarray(d, jnp.float32), degree=4))
    assert out.shape == (5, 16)
    for i in range(5):
        np.testing.assert_allclose(out[i], _sh_oracle_deg4(*d[i]), atol=1e-5)


def test_sh_encode_degrees():
    d = jnp.array([[0.2, -0.5, 0.84]])
    for deg in range(1, 9):
        assert sh_encode(d, deg).shape == (1, deg * deg)
    with pytest.raises(ValueError):
        sh_encode(d, 9)


# ------------------------------------------------------------- trunc_exp ----
def test_trunc_exp():
    x = jnp.array([-2.0, 0.0, 3.0])
    np.testing.assert_allclose(np.asarray(trunc_exp(x)), np.exp([-2.0, 0.0, 3.0]), rtol=1e-6)
    # gradient clamps the pre-activation at 15
    g = jax.grad(lambda v: trunc_exp(v).sum())(jnp.array([20.0, 1.0]))
    np.testing.assert_allclose(np.asarray(g), [np.exp(15.0), np.exp(1.0)], rtol=1e-5)


# ------------------------------------------------------------------ grid ----
_PRIMES = np.array(
    [1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737],
    dtype=np.uint64,
)


def _grid_oracle_point(x, emb, meta):
    """Per-point oracle mirroring kernel_grid (gridencoder.cu:88-245)."""
    D, C, L = meta.input_dim, meta.level_dim, meta.num_levels
    S = math.log2(meta.per_level_scale)
    H = meta.base_resolution
    if np.any((x < 0) | (x > 1)):
        return np.zeros(L * C, np.float32)
    out = np.zeros(L * C, np.float32)
    for lvl in range(L):
        hashmap_size = meta.offsets[lvl + 1] - meta.offsets[lvl]
        scale = math.exp2(lvl * S) * H - 1.0
        resolution = int(math.ceil(scale)) + 1
        pos = x * scale + (0.0 if meta.align_corners else 0.5)
        pos_grid = np.floor(pos).astype(np.uint64)
        frac = pos - pos_grid
        if meta.interpolation == "smoothstep":
            frac = frac * frac * (3.0 - 2.0 * frac)
        acc = np.zeros(C, np.float32)
        for idx in range(1 << D):
            w = 1.0
            local = np.zeros(D, np.uint64)
            for d in range(D):
                if (idx >> d) & 1:
                    w *= frac[d]
                    local[d] = pos_grid[d] + 1
                else:
                    w *= 1.0 - frac[d]
                    local[d] = pos_grid[d]
            # get_grid_index
            stride, index = 1, 0
            side = resolution if meta.align_corners else resolution + 1
            for d in range(D):
                if stride > hashmap_size:
                    break
                index += int(local[d]) * stride
                stride *= side
            if meta.gridtype == "hash" and stride > hashmap_size:
                h = np.uint64(0)
                for d in range(D):
                    h ^= (local[d] * _PRIMES[d]) & np.uint64(0xFFFFFFFF)
                index = int(h) & 0xFFFFFFFF
            entry = (index % hashmap_size) + meta.offsets[lvl]
            acc += w * emb[entry]
        out[lvl * C : (lvl + 1) * C] = acc
    return out


@pytest.mark.parametrize("gridtype", ["hash", "tiled"])
@pytest.mark.parametrize("interp", ["linear", "smoothstep"])
def test_grid_encode_vs_oracle(gridtype, interp):
    meta = make_grid_meta(
        input_dim=3,
        num_levels=4,
        level_dim=2,
        base_resolution=4,
        log2_hashmap_size=7,  # small so hashing actually kicks in
        desired_resolution=32,
        gridtype=gridtype,
        interpolation=interp,
    )
    emb = np.asarray(init_grid_embeddings(jax.random.PRNGKey(0), meta)) * 1e4
    rng = np.random.RandomState(3)
    pts = np.concatenate(
        [rng.rand(16, 3), np.array([[1.2, 0.5, 0.5], [-0.1, 0.2, 0.3]])]
    ).astype(np.float32)
    out = np.asarray(grid_encode(jnp.asarray(pts), jnp.asarray(emb), meta))
    assert out.shape == (18, meta.output_dim)
    for i in range(len(pts)):
        np.testing.assert_allclose(
            out[i], _grid_oracle_point(pts[i], emb, meta), atol=2e-4,
            err_msg=f"point {i} ({gridtype}/{interp})",
        )


def test_grid_encode_2d_ambient():
    """The RADNeRF ambient grid is 2-D tiled (radnerf.py:40-46)."""
    meta = make_grid_meta(
        input_dim=2, num_levels=4, level_dim=2, base_resolution=4,
        log2_hashmap_size=10, desired_resolution=32, gridtype="tiled",
    )
    emb = init_grid_embeddings(jax.random.PRNGKey(1), meta)
    pts = jnp.asarray(np.random.RandomState(0).rand(7, 2), jnp.float32)
    out = grid_encode(pts, emb, meta)
    assert out.shape == (7, meta.output_dim)
    oracle = _grid_oracle_point(np.asarray(pts[3]), np.asarray(emb), meta)
    np.testing.assert_allclose(np.asarray(out[3]), oracle, atol=1e-6)


def test_grid_encode_grads_flow():
    meta = make_grid_meta(
        input_dim=3, num_levels=2, level_dim=2, base_resolution=4,
        log2_hashmap_size=6, desired_resolution=8,
    )
    emb = init_grid_embeddings(jax.random.PRNGKey(0), meta)
    pts = jnp.asarray(np.random.RandomState(1).rand(5, 3), jnp.float32)

    g_emb = jax.grad(lambda e: grid_encode(pts, e, meta).sum())(emb)
    assert float(jnp.abs(g_emb).sum()) > 0  # scatter-add grad reaches table
    g_pts = jax.grad(lambda p: grid_encode(p, emb, meta).sum())(pts)
    assert np.all(np.isfinite(np.asarray(g_pts)))
    # numerical check of input grads
    eps = 1e-4
    f = lambda p: float(grid_encode(p, emb, meta).sum())
    p0 = pts
    num = (f(p0.at[0, 1].add(eps)) - f(p0.at[0, 1].add(-eps))) / (2 * eps)
    np.testing.assert_allclose(float(g_pts[0, 1]), num, rtol=2e-2, atol=1e-5)


def test_grid_encode_oob_zero_and_masked_grad():
    meta = make_grid_meta(input_dim=3, num_levels=2, level_dim=2,
                          base_resolution=4, desired_resolution=8)
    emb = init_grid_embeddings(jax.random.PRNGKey(0), meta)
    pts = jnp.array([[1.5, 0.5, 0.5]])
    out = grid_encode(pts, emb, meta)
    np.testing.assert_allclose(np.asarray(out), 0.0)
