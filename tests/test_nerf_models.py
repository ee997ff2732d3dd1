"""Vanilla NeRF family tests: backbones, conditioning, samplers, full render."""

import jax
import jax.numpy as jnp
import numpy as np

from geneface_tpu.data.ray_samplers import (
    FullRaySampler,
    PatchRaySampler,
    TorsoUniformRaySampler,
    UniformRaySampler,
    get_rays_nerf,
    sample_pixels,
)
from geneface_tpu.models.nerf import ADNeRF, ADNeRFTorso, Lm3dNeRF
from geneface_tpu.ops import render_rays


def test_adnerf_shapes():
    model = ADNeRF(cond_dim=16, hidden_size=32)
    cond = jnp.zeros((8, 16, 29))  # [smo_win, W, C] deepspeech window
    pos = jnp.zeros((4, 6, 3))
    view = jnp.zeros((4, 3))
    params = model.init(jax.random.PRNGKey(0), cond, pos, view, method=model.init_all)
    feat = model.apply(params, cond, True, method=model.cal_cond_feat)
    assert feat.shape == (16,)
    raw = model.apply(params, pos, feat, view, True)
    assert raw.shape == (4, 6, 4)


def test_lm3d_nerf_window_and_mlp_cond():
    for use_window in (True, False):
        model = Lm3dNeRF(cond_dim=16, hidden_size=32, use_window_cond=use_window)
        cond = jnp.zeros((5, 1, 204)) if use_window else jnp.zeros((1, 204))
        pos = jnp.zeros((4, 6, 3))
        view = jnp.zeros((4, 3))
        params = model.init(
            jax.random.PRNGKey(0), cond, pos, view, method=model.init_all
        )
        feat = model.apply(params, cond, use_window, method=model.cal_cond_feat)
        raw = model.apply(params, pos, feat, view, False)
        assert raw.shape == (4, 6, 4)


def test_adnerf_torso_pose_cond():
    model = ADNeRFTorso(cond_dim=16, hidden_size=32)
    cond = jnp.zeros((8, 16, 29))
    pos = jnp.zeros((4, 6, 3))
    view = jnp.zeros((4, 3))
    params = model.init(jax.random.PRNGKey(0), cond, pos, view, method=model.init_all)
    feat = model.apply(
        params, cond, jnp.zeros(3), jnp.zeros(3), None, True,
        method=model.cal_cond_feat,
    )
    # cond 16 + euler freq6 (3*13=39) + trans 39
    assert feat.shape == (1, 16 + 39 + 39)


def test_lm3d_nerf_end_to_end_render():
    """Full render_rays through the Lm3dNeRF field — BASELINE config[0] shape."""
    model = Lm3dNeRF(cond_dim=16, hidden_size=32)
    cond = jnp.asarray(np.random.RandomState(0).randn(5, 1, 204), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), cond, jnp.zeros((2, 4, 3)), jnp.zeros((2, 3)),
        method=model.init_all,
    )
    feat = model.apply(params, cond, True, method=model.cal_cond_feat)

    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 1.0  # OpenGL: camera looks down -z
    sampler = UniformRaySampler(rng=np.random.RandomState(0))
    ro, rd, coords = sampler(64, 64, 500, pose, n_rays=32)
    viewdirs = rd / np.linalg.norm(rd, axis=-1, keepdims=True)

    def query_fn(pts, fine):
        return model.apply(params, pts, feat, jnp.asarray(viewdirs), fine)

    bc = jnp.ones((32, 3)) * 0.3
    out = render_rays(
        query_fn, jnp.asarray(ro), jnp.asarray(rd), 0.3, 0.9, bc,
        n_samples=8, n_importance=8, rng=jax.random.PRNGKey(0),
    )
    assert out["rgb_map"].shape == (32, 3)
    assert np.all(np.isfinite(np.asarray(out["rgb_map"])))


# ---------------------------------------------------------------- samplers ----
def test_uniform_sampler_rect_weighting():
    s = UniformRaySampler(rng=np.random.RandomState(0))
    coords = s.sample_coords(100, 100, n_rays=100, rect=(20, 30, 40, 40),
                             in_rect_percent=0.9)
    rows, cols = coords[:, 0], coords[:, 1]
    in_rect = (rows >= 30) & (rows <= 70) & (cols >= 20) & (cols <= 60)
    assert in_rect.sum() == 90
    assert len(np.unique(coords[:, 0] * 100 + coords[:, 1])) == 100  # no dup


def test_torso_sampler_defaults_lower_half():
    s = TorsoUniformRaySampler(rng=np.random.RandomState(0))
    coords = s.sample_coords(100, 100, n_rays=50, in_rect_percent=1.0)
    assert (coords[:, 0] >= 50).all()


def test_full_sampler_scale():
    s = FullRaySampler(scale_factor=0.5)
    coords = s.sample_coords(64, 64)
    assert coords.shape == (32 * 32, 2)
    assert coords.max() == 63


def test_patch_sampler():
    s = PatchRaySampler(n_rays=64, rng=np.random.RandomState(0))
    pose = np.eye(4, dtype=np.float32)
    ro, rd, grid = s(64, 64, 500, pose)
    assert ro.shape == (64, 3) and rd.shape == (64, 3)
    assert grid.shape == (8, 8, 2)
    assert np.abs(grid).max() <= 1.0


def test_get_rays_nerf_convention():
    pose = np.eye(4, dtype=np.float32)
    ro, rd = get_rays_nerf(4, 4, 100, pose, cx=2, cy=2)
    # center pixel looks straight down -z
    assert rd[2, 2, 2] == -1.0
    # pixel right of center has +x direction
    assert rd[2, 3, 0] > 0
    # pixel above center (smaller row) has +y (OpenGL)
    assert rd[1, 2, 1] > 0
    img = np.arange(16 * 3).reshape(4, 4, 3)
    px = sample_pixels(img, np.array([[1, 2]]))
    np.testing.assert_array_equal(px[0], img[1, 2])
