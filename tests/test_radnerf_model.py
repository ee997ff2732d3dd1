"""RAD-NeRF model family tests: field queries, occupancy lifecycle, render."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geneface_tpu.models.radnerf import (
    RADNeRF,
    RADNeRFTorso,
    init_occupancy,
    init_torso_occupancy,
    mark_untrained_grid,
    render_rays_radnerf,
    render_rays_radnerf_torso,
    update_extra_state,
    update_torso_occupancy,
)
from geneface_tpu.utils.camera import get_bg_coords, get_rays

GRID = 32  # small grid for tests


def tiny_model(**kw):
    return RADNeRF(
        cond_type="idexp_lm3d_normalized",
        cond_out_dim=16,
        cond_win_size=1,
        smo_win_size=3,
        log2_hashmap_size=9,
        desired_resolution=64,
        hidden_dim_ambient=16,
        hidden_dim_sigma=16,
        geo_feat_dim=16,
        hidden_dim_color=16,
        individual_embedding_num=10,
        individual_embedding_dim=4,
        **kw,
    )


@pytest.fixture(scope="module")
def model_and_params():
    model = tiny_model()
    cond = jnp.zeros((3, 1, 204))  # [smo_win, W, C]
    xyz = jnp.zeros((8, 3))
    dirs = jnp.zeros((8, 3))
    params = model.init(jax.random.PRNGKey(0), cond, xyz, dirs, method=model.init_all)
    return model, params


def test_field_query_shapes(model_and_params):
    model, params = model_and_params
    N = 17
    xyz = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (N, 3)), jnp.float32)
    dirs = xyz / jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    cond_feat = jnp.ones((1, 16))
    sigma, color, ambient = model.apply(params, xyz, dirs, cond_feat, jnp.zeros(4))
    assert sigma.shape == (N,)
    assert color.shape == (N, 3)
    assert ambient.shape == (N, 2)
    assert float(sigma.min()) >= 0  # trunc_exp
    assert 0 <= float(color.min()) and float(color.max()) <= 1
    assert np.all(np.abs(np.asarray(ambient)) <= 1)  # tanh


def test_cond_feat_path(model_and_params):
    model, params = model_and_params
    cond = jnp.asarray(np.random.RandomState(1).randn(3, 1, 204), jnp.float32)
    feat = model.apply(params, cond, method=model.cal_cond_feat)
    assert feat.shape == (1, 16)
    assert np.all(np.isfinite(np.asarray(feat)))


def test_occupancy_lifecycle(model_and_params):
    model, params = model_and_params
    occ = init_occupancy(GRID, bound=1.0)

    # frustum marking: a camera at z=-4 looking at origin covers some cells
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -4.0
    occ = mark_untrained_grid(occ, pose[None], (1200, 1200, 128, 128), GRID, 1.0)
    dg = np.asarray(occ.density_grid)
    assert (dg == -1).any() and (dg == 0).any()

    cond_feat = jnp.ones((1, 16))

    def density_fn(x):
        return model.apply(params, x, cond_feat, method=model.density)["sigma"]

    occ2 = update_extra_state(
        density_fn, occ, jax.random.PRNGKey(0),
        grid_size=GRID, bound=1.0, density_thresh=10.0, chunks=4,
    )
    assert float(occ2.mean_density) >= 0
    # untrained cells stay -1 forever (renderer.py:253 valid_mask)
    assert np.all(np.asarray(occ2.density_grid)[dg == -1] == -1)
    # occupancy derived from threshold
    assert occ2.occ_grid.shape == (1, GRID, GRID, GRID)


def test_render_rays_end_to_end(model_and_params):
    model, params = model_and_params
    occ = init_occupancy(GRID, bound=1.0)
    occ = occ._replace(occ_grid=jnp.ones_like(occ.occ_grid))  # everything occupied

    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.0
    rays = get_rays(pose, (300, 300, 32, 32), 64, 64, n_rays=128,
                    rng=np.random.RandomState(0))
    cond_feat = jnp.ones((1, 16))

    def field_fn(xyz, dirs):
        return model.apply(params, xyz, dirs, cond_feat, jnp.zeros(4))

    out = render_rays_radnerf(
        field_fn,
        jnp.asarray(rays["rays_o"]), jnp.asarray(rays["rays_d"]), occ,
        bound=1.0, min_near=0.05, dt_gamma=1 / 256, max_steps=16,
        grid_size=GRID, rng=jax.random.PRNGKey(1),
    )
    assert out["rgb_map"].shape == (128, 3)
    assert np.all(np.isfinite(np.asarray(out["rgb_map"])))
    assert float(out["n_samples"].max()) > 0
    assert float(out["weights_sum"].min()) >= 0


def test_occupied_aabb_tight_box():
    from geneface_tpu.models.radnerf.renderer import occupied_aabb

    occ = init_occupancy(GRID, bound=1.0)
    g = np.zeros((1, GRID, GRID, GRID), bool)
    g[0, 10:14, 8:12, 16:20] = True  # occupied block
    box = np.asarray(occupied_aabb(jnp.asarray(g), 1.0))
    # box must contain the occupied cells (with margin) and be tight-ish
    cell = 2.0 / GRID
    assert box[0] <= (10 * cell - 1.0) and box[3] >= (14 * cell - 1.0)
    assert box[0] >= -1.0 and box[3] <= 1.0
    assert box[3] - box[0] < 1.0  # much tighter than the full box

    # empty grid falls back to the full (make_aabb, half-height-y) box
    from geneface_tpu.models.radnerf.renderer import make_aabb

    empty = np.asarray(occupied_aabb(jnp.zeros_like(jnp.asarray(g)), 1.0))
    np.testing.assert_allclose(empty, np.asarray(make_aabb(1.0)), atol=1e-5)


def test_render_ray_capacity_matches_dense(model_and_params):
    """Culled render (ray_capacity) ~= dense render on hit rays; culled
    rays get pure background."""
    model, params = model_and_params
    occ = init_occupancy(GRID, bound=1.0)
    g = np.zeros((1, GRID, GRID, GRID), bool)
    g[0, 12:20, 12:20, 12:20] = True  # small occupied cube near origin
    occ = occ._replace(occ_grid=jnp.asarray(g))

    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.0
    rays = get_rays(pose, (100, 100, 32, 32), 64, 64, n_rays=256,
                    rng=np.random.RandomState(3))
    cond_feat = jnp.ones((1, 16))

    def field_fn(xyz, dirs):
        return model.apply(params, xyz, dirs, cond_feat, jnp.zeros(4))

    kw = dict(bound=1.0, min_near=0.05, dt_gamma=1 / 256, max_steps=16,
              grid_size=GRID, bg_color=0.25)
    ro, rd = jnp.asarray(rays["rays_o"]), jnp.asarray(rays["rays_d"])
    dense = render_rays_radnerf(field_fn, ro, rd, occ, **kw)
    culled = render_rays_radnerf(field_fn, ro, rd, occ, ray_capacity=256, **kw)

    a = np.asarray(dense["rgb_map"])
    b = np.asarray(culled["rgb_map"])
    np.testing.assert_allclose(a, b, atol=2e-3)
    n_cull = int(culled["n_culled_rays"])
    assert 0 <= n_cull < 256
    # culled rays are exactly background
    ws = np.asarray(culled["weights_sum"])
    assert np.all(np.abs(b[ws == 0] - 0.25) < 1e-6)


def test_render_gradients_flow(model_and_params):
    model, params = model_and_params
    occ = init_occupancy(GRID, bound=1.0)
    occ = occ._replace(occ_grid=jnp.ones_like(occ.occ_grid))
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.0
    rays = get_rays(pose, (300, 300, 32, 32), 64, 64, n_rays=32,
                    rng=np.random.RandomState(0))
    ro, rd = jnp.asarray(rays["rays_o"]), jnp.asarray(rays["rays_d"])
    gt = jnp.zeros((32, 3))

    def loss_fn(p):
        def field_fn(xyz, dirs):
            return model.apply(p, xyz, dirs, jnp.ones((1, 16)), jnp.zeros(4))

        out = render_rays_radnerf(
            field_fn, ro, rd, occ,
            bound=1.0, min_near=0.05, dt_gamma=1 / 256, max_steps=16,
            grid_size=GRID,
        )
        return jnp.mean((out["rgb_map"] - gt) ** 2)

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    total = sum(float(jnp.abs(g).sum()) for g in leaves)
    assert np.isfinite(total) and total > 0
    # grid embeddings receive scatter-add gradients (fused backend stores
    # them as per-group tables -> sum over leaves)
    g_pos = grads["params"]["pos_embeddings"]
    g_sum = sum(
        float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(g_pos)
    )
    assert g_sum > 0


def test_torso_model():
    model = RADNeRFTorso(
        cond_type="idexp_lm3d_normalized",
        cond_out_dim=16,
        cond_win_size=1,
        smo_win_size=3,
        log2_hashmap_size=9,
        desired_resolution=64,
        hidden_dim_ambient=16,
        hidden_dim_sigma=16,
        geo_feat_dim=16,
        hidden_dim_color=16,
        individual_embedding_num=10,
        individual_embedding_dim=4,
        torso_individual_embedding_dim=8,
    )
    xy = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (20, 2)), jnp.float32)
    pose6 = jnp.zeros((1, 6))
    ind = jnp.zeros(8)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((3, 1, 204)), jnp.zeros((4, 3)),
        jnp.zeros((4, 3)), method=model.init_all,
    )
    alpha, color, dx = model.apply(params, xy, pose6, ind, method=model.forward_torso)
    assert alpha.shape == (20, 1) and color.shape == (20, 3) and dx.shape == (20, 2)

    # torso occupancy update + full composite
    tocc = init_torso_occupancy(GRID)

    def alpha_fn(xy_pts):
        a, _, _ = model.apply(params, xy_pts, pose6, ind, method=model.forward_torso)
        return a[:, 0]

    tocc = update_torso_occupancy(alpha_fn, tocc, jax.random.PRNGKey(2), grid_size=GRID)
    assert float(tocc.mean_density) > 0

    # head+torso render path
    occ = init_occupancy(GRID, bound=1.0)
    occ = occ._replace(occ_grid=jnp.ones_like(occ.occ_grid))
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.0
    rays = get_rays(pose, (300, 300, 32, 32), 64, 64, n_rays=64,
                    rng=np.random.RandomState(1))
    bg_coords = get_bg_coords(64, 64)[0][rays["inds"]]

    merged = params  # init_all created head + torso params together

    def field_fn(xyz, dirs):
        return model.apply(merged, xyz, dirs, jnp.ones((1, 16)), jnp.zeros(4))

    def torso_fn(xy_pts, head_img, head_ws):
        return model.apply(
            merged, xy_pts, pose6, ind, head_img, head_ws,
            method=model.forward_torso,
        )

    out = render_rays_radnerf_torso(
        field_fn, torso_fn,
        jnp.asarray(rays["rays_o"]), jnp.asarray(rays["rays_d"]),
        jnp.asarray(bg_coords), occ, tocc,
        bound=1.0, min_near=0.05, dt_gamma=1 / 256, max_steps=16,
        grid_size=GRID, density_thresh_torso=0.01,
    )
    assert out["rgb_map"].shape == (64, 3)
    assert np.all(np.isfinite(np.asarray(out["rgb_map"])))
    assert out["torso_alpha_map"].shape == (64, 1)
