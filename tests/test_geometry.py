"""Geometry ops: sph_from_ray, sRGB transfer, iso-surface extraction.

Oracles are analytic (sphere fields / closed-form transfer curves) with the
reference semantics cited in ``geneface_tpu/ops/geometry.py``.
"""

import jax.numpy as jnp
import numpy as np

from geneface_tpu.ops.encoders import get_encoder
from geneface_tpu.ops.geometry import (
    extract_geometry,
    linear_to_srgb,
    marching_tetrahedra,
    sph_from_ray,
    srgb_to_linear,
)


def test_sph_from_ray_hits_sphere():
    rng = np.random.RandomState(0)
    N, radius = 257, 2.5
    o = rng.uniform(-0.4, 0.4, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    coords = np.asarray(sph_from_ray(jnp.asarray(o), jnp.asarray(d), radius))
    assert coords.shape == (N, 3 - 1)
    theta = (coords[:, 0] + 1.0) * np.pi / 2.0
    phi = coords[:, 1] * np.pi
    # reconstruct the hit point from (theta, phi) and verify it lies on the
    # sphere AND on the ray (t > 0, far-side root)
    p = radius * np.stack(
        [np.sin(theta) * np.cos(phi), np.cos(theta), np.sin(theta) * np.sin(phi)],
        axis=-1,
    )
    assert np.allclose(np.linalg.norm(p, axis=-1), radius, atol=1e-4)
    t = np.einsum("nd,nd->n", p - o, d)
    assert (t > 0).all()
    off_ray = np.linalg.norm(p - (o + t[:, None] * d), axis=-1)
    assert off_ray.max() < 1e-3


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 512)
    y = srgb_to_linear(linear_to_srgb(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=2e-4)
    # reference constants: breakpoints
    assert float(linear_to_srgb(jnp.asarray(0.0))) == 0.0
    np.testing.assert_allclose(
        float(linear_to_srgb(jnp.asarray(0.002))), 12.92 * 0.002, rtol=1e-6
    )


def test_marching_tetrahedra_sphere():
    R = 48
    xs = np.linspace(-1, 1, R, dtype=np.float32)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    field = 0.5 - np.linalg.norm(g, axis=-1)  # inside-positive, radius 0.5
    verts, faces = marching_tetrahedra(field, 0.0)
    assert len(verts) > 100 and len(faces) > 100
    # vertices are in index coords: convert back to world
    world = verts / (R - 1.0) * 2.0 - 1.0
    r = np.linalg.norm(world, axis=-1)
    assert abs(r.mean() - 0.5) < 0.02
    assert np.abs(r - 0.5).max() < 0.06
    assert faces.min() >= 0 and faces.max() < len(verts)


def test_extract_geometry_queries_device_fn():
    def density(pts):
        return 10.0 * (0.3 - jnp.linalg.norm(pts, axis=-1))

    verts, faces = extract_geometry(
        [-1, -1, -1], [1, 1, 1], resolution=32, threshold=0.0, query_func=density
    )
    r = np.linalg.norm(verts, axis=-1)
    assert abs(r.mean() - 0.3) < 0.03
    assert len(faces) > 50


def test_get_encoder_dispatch():
    import jax

    fn, dim, init = get_encoder("None", input_dim=5)
    assert dim == 5 and init is None
    x = jnp.ones((4, 5))
    np.testing.assert_array_equal(np.asarray(fn(x)), np.asarray(x))

    fn, dim, init = get_encoder("frequency", multires=6)
    assert dim == 3 * (1 + 2 * 6)
    assert fn(jnp.zeros((4, 3))).shape == (4, dim)

    fn, dim, init = get_encoder("spherical_harmonics", degree=4)
    assert dim == 16

    fn, dim, init = get_encoder(
        "hashgrid", input_dim=3, num_levels=4, level_dim=2,
        log2_hashmap_size=8, desired_resolution=64,
    )
    params = init(jax.random.PRNGKey(0))
    out = fn(jnp.full((4, 3), 0.5), params)
    assert out.shape == (4, dim) and dim == 8
