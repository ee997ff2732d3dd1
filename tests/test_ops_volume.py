"""Vanilla-NeRF quadrature tests, incl. golden parity vs the torch reference."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geneface_tpu.ops import raw2outputs, render_rays, sample_pdf


def _import_reference_volume():
    sys.path.insert(0, "/root/reference")
    try:
        from modules.nerfs.commons import volume_rendering as ref

        return ref
    except Exception:
        return None
    finally:
        sys.path.pop(0)


def test_raw2outputs_golden_vs_torch_reference():
    ref = _import_reference_volume()
    if ref is None:
        pytest.skip("torch reference not importable")
    import torch

    rng = np.random.RandomState(0)
    N, S = 16, 12
    raw = rng.randn(N, S, 4).astype(np.float32)
    z_vals = np.sort(rng.rand(N, S).astype(np.float32) * 0.6 + 0.3, axis=-1)
    rays_d = rng.randn(N, 3).astype(np.float32)
    bc = rng.rand(N, 3).astype(np.float32)

    t_out = ref.raw2outputs(
        torch.tensor(raw), torch.tensor(z_vals), torch.tensor(rays_d),
        torch.tensor(bc), raw_noise_std=0, white_bkgd=False,
    )
    j_out = raw2outputs(
        jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(rays_d), jnp.asarray(bc)
    )
    names = ["rgb_map", "disp_map", "acc_map", "weights", "depth_map", "rgb_map_fg"]
    for name, t in zip(names, t_out):
        np.testing.assert_allclose(
            np.asarray(j_out[name]), t.numpy(), atol=1e-5, err_msg=name
        )


def test_sample_pdf_golden_vs_torch_reference_det():
    ref = _import_reference_volume()
    if ref is None:
        pytest.skip("torch reference not importable")
    import torch

    rng = np.random.RandomState(1)
    N, B = 8, 15
    bins = np.sort(rng.rand(N, B).astype(np.float32), axis=-1)
    weights = rng.rand(N, B - 1).astype(np.float32)

    t_s = ref.sample_pdf(torch.tensor(bins), torch.tensor(weights), 32, det=True)
    j_s = sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 32, det=True)
    np.testing.assert_allclose(np.asarray(j_s), t_s.numpy(), atol=1e-5)


def test_render_rays_end_to_end_shapes():
    def query_fn(pts, fine):
        # toy field: gaussian blob density at origin, position-colored
        d2 = jnp.sum(pts**2, axis=-1, keepdims=True)
        sigma = 20.0 * jnp.exp(-d2 * 8.0) - 5.0
        rgb_logits = pts
        return jnp.concatenate([rgb_logits, sigma], axis=-1)

    N = 32
    rng = np.random.RandomState(0)
    o = np.zeros((N, 3), np.float32)
    o[:, 2] = -1.5
    d = rng.randn(N, 3).astype(np.float32) * 0.05
    d[:, 2] = 1.0
    bc = np.ones((N, 3), np.float32) * 0.5

    out = render_rays(
        query_fn, jnp.asarray(o), jnp.asarray(d), 0.8, 2.2,
        jnp.asarray(bc), n_samples=16, n_importance=16,
        rng=jax.random.PRNGKey(0),
    )
    assert out["rgb_map"].shape == (N, 3)
    assert out["rgb_map_coarse"].shape == (N, 3)
    assert out["z_std"].shape == (N,)
    assert np.all(np.isfinite(np.asarray(out["rgb_map"])))
    assert float(out["acc_map"].max()) > 0.5  # blob is hit

    # deterministic path (no rng)
    out_det = render_rays(
        query_fn, jnp.asarray(o), jnp.asarray(d), 0.8, 2.2,
        jnp.asarray(bc), n_samples=16, n_importance=16, rng=None,
    )
    out_det2 = render_rays(
        query_fn, jnp.asarray(o), jnp.asarray(d), 0.8, 2.2,
        jnp.asarray(bc), n_samples=16, n_importance=16, rng=None,
    )
    np.testing.assert_array_equal(
        np.asarray(out_det["rgb_map"]), np.asarray(out_det2["rgb_map"])
    )


def test_render_rays_differentiable():
    def make_query(scale):
        def query_fn(pts, fine):
            d2 = jnp.sum(pts**2, axis=-1, keepdims=True)
            return jnp.concatenate([pts * scale, 10.0 * jnp.exp(-d2 * 4) - 2], -1)
        return query_fn

    o = jnp.array([[0.0, 0.0, -1.5]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    bc = jnp.ones((1, 3)) * 0.2

    def loss(scale):
        out = render_rays(make_query(scale), o, d, 0.8, 2.2, bc, 8, 8, rng=None)
        return jnp.sum(out["rgb_map"] ** 2)

    g = jax.grad(loss)(1.0)
    assert np.isfinite(float(g)) and abs(float(g)) > 0
