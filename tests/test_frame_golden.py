"""Frame-level golden render: our jitted ``render_rays_radnerf`` vs an
independently composed reference pipeline.

The closest achievable proxy to a bit-matched May frame in this environment
(no CUDA, no released checkpoint): compose the reference's pure-torch
submodules (cond encoders + MLPs, imported through
``torch_import.radnerf_params_from_torch``) with the per-ray numpy march /
composite oracles that mirror ``raymarching.cu`` line-for-line
(``tests/test_ops_raymarch.py``), plus the formula-oracle-tested
reference-semantics grid/SH encoders, into a full frame — and assert our
fused single-pass renderer matches per pixel.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout unavailable"
)
torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.test_ops_raymarch import _composite_oracle, _march_oracle  # noqa: E402
from tests.test_torch_golden import radnerf_pair  # noqa: E402,F401

GRID = 32
BOUND = 1.0
MAX_STEPS = 8
DT_GAMMA = 1.0 / 256
MIN_NEAR = 0.05


def _field_oracle(xyz, dirs, sd, torch_mods, ind_code, cond_feat_np, meta_pos,
                  meta_amb):
    """Reference field semantics: grids via the formula-tested
    reference-layout encoder, MLPs via the reference's own torch modules."""
    from geneface_tpu.ops import sh_encode
    from geneface_tpu.ops.encoders import grid_encode

    M = xyz.shape[0]
    x01 = (xyz + BOUND) / (2 * BOUND)
    pos_emb = jnp.asarray(sd["position_embedder.embeddings"])
    amb_emb = jnp.asarray(sd["ambient_embedder.embeddings"])
    pos_feat = np.asarray(grid_encode(jnp.asarray(x01), pos_emb, meta_pos))

    cond_rep = np.broadcast_to(cond_feat_np.reshape(1, -1), (M, 64))
    with torch.no_grad():
        amb_logit = torch_mods["ambient"](
            torch.from_numpy(
                np.concatenate([pos_feat, cond_rep], -1).astype(np.float32)
            )
        ).numpy()
    amb01 = (np.tanh(amb_logit) + 1.0) / 2.0
    amb_feat = np.asarray(grid_encode(jnp.asarray(amb01), amb_emb, meta_amb))

    with torch.no_grad():
        h = torch_mods["sigma"](
            torch.from_numpy(
                np.concatenate([pos_feat, amb_feat], -1).astype(np.float32)
            )
        ).numpy()
    sigma = np.exp(np.clip(h[:, 0], -15.0, 15.0))  # trunc_exp fwd
    geo = h[:, 1:]
    sh = np.asarray(sh_encode(jnp.asarray(dirs), 4))
    ind = np.broadcast_to(ind_code.reshape(1, -1), (M, ind_code.shape[-1]))
    with torch.no_grad():
        rgb = torch.sigmoid(
            torch_mods["color"](
                torch.from_numpy(
                    np.concatenate([sh, geo, ind], -1).astype(np.float32)
                )
            )
        ).numpy()
    return sigma, rgb


def test_full_frame_matches_reference_composition(radnerf_pair):  # noqa: F811
    from geneface_tpu.models.radnerf import render_rays_radnerf
    from geneface_tpu.models.radnerf.renderer import OccupancyState, make_aabb
    from geneface_tpu.tasks.radnerf import model_from_cfg
    from geneface_tpu.utils.camera import get_rays

    model_bf16, params, sd, torch_mods = radnerf_pair
    # f32 twin (same params; dtype only sets MLP compute precision) so the
    # comparison tolerance is float roundoff, not bf16 quantization
    cfg_kw = {
        f: getattr(model_bf16, f)
        for f in (
            "cond_type", "cond_out_dim", "cond_win_size", "smo_win_size",
            "with_att", "bound", "grid_type", "log2_hashmap_size",
            "desired_resolution", "grid_num_levels", "grid_level_dim",
            "num_layers_ambient", "hidden_dim_ambient", "num_layers_sigma",
            "hidden_dim_sigma", "geo_feat_dim", "num_layers_color",
            "hidden_dim_color", "individual_embedding_num",
            "individual_embedding_dim", "grid_backend",
        )
    }
    model = type(model_bf16)(dtype=jnp.float32, **cfg_kw)

    # analytic ball occupancy
    H = GRID
    r = (np.arange(H) + 0.5) / H * 2.0 - 1.0
    gx, gy, gz = np.meshgrid(r, r, r, indexing="ij")
    occ_np = (np.sqrt(gx**2 + gy**2 + gz**2) < 0.35)[None]
    occ = OccupancyState(
        density_grid=jnp.asarray(occ_np.reshape(1, -1), jnp.float32),
        occ_grid=jnp.asarray(occ_np),
        mean_density=jnp.asarray(0.0, jnp.float32),
    )

    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.0  # ngp convention: camera looks along +z, ball at origin
    n_side = 12
    rays = get_rays(pose, (120.0, 120.0, n_side / 2, n_side / 2),
                    n_side, n_side)
    ro = rays["rays_o"].astype(np.float32)
    rd = rays["rays_d"].astype(np.float32)
    N = ro.shape[0]

    # reference grid geometry exactly as RADNeRF.setup builds it (cap is
    # unadjusted at level_dim=2)
    from geneface_tpu.ops.encoders import make_grid_meta

    meta_pos = make_grid_meta(
        input_dim=3, num_levels=16, level_dim=2, base_resolution=16,
        log2_hashmap_size=16, desired_resolution=256, gridtype="tiled",
    )
    meta_amb = make_grid_meta(
        input_dim=2, num_levels=16, level_dim=2, base_resolution=16,
        log2_hashmap_size=16, desired_resolution=256, gridtype="tiled",
    )

    cond = jnp.ones((5, 1, 204))
    cond_feat = np.asarray(
        model.apply(params, cond, method=model.cal_cond_feat)
    )
    ind_code = np.asarray(params["params"]["individual_embeddings"][0])

    # ---- ours: one jitted render over the padded frame ----
    def field_fn(xyz, dirs):
        return model.apply(params, xyz, dirs, jnp.asarray(cond_feat),
                           jnp.asarray(ind_code))

    out = render_rays_radnerf(
        field_fn, jnp.asarray(ro), jnp.asarray(rd), occ,
        bound=BOUND, min_near=MIN_NEAR, dt_gamma=DT_GAMMA,
        max_steps=MAX_STEPS, grid_size=GRID, bg_color=0.25, rng=None,
    )
    ours = np.asarray(out["rgb_map"])

    # ---- reference composition: per-ray numpy march -> torch field ->
    # numpy composite -> bg blend ----
    from tests.test_ops_raymarch import _near_far_oracle

    aabb = np.asarray(make_aabb(BOUND))
    ref = np.zeros((N, 3), np.float32)
    for i in range(N):
        near, far = _near_far_oracle(ro[i], rd[i], aabb, MIN_NEAR)
        samples = (
            _march_oracle(ro[i], rd[i], occ_np, BOUND, DT_GAMMA, MAX_STEPS,
                          near, far, 0.0, GRID)
            if near < 1e30
            else []
        )
        if not samples:
            ref[i] = 0.25
            continue
        ts = np.asarray([s[0] for s in samples], np.float32)
        dts = np.asarray([s[1] for s in samples], np.float32)
        dpts = np.asarray([s[2] for s in samples], np.float32)
        xyz = ro[i][None] + ts[:, None] * rd[i][None]
        dirs = np.broadcast_to(rd[i][None], xyz.shape)
        sigma, rgb = _field_oracle(
            xyz.astype(np.float32), np.ascontiguousarray(dirs), sd,
            torch_mods, ind_code, cond_feat, meta_pos, meta_amb,
        )
        r_fg, ws, _dep, _amb = _composite_oracle(
            sigma, rgb, dts, dpts, len(samples), 1e-4
        )
        ref[i] = r_fg + (1.0 - ws) * 0.25

    # the scene must really render foreground, or the comparison is vacuous
    assert float(np.asarray(out["weights_sum"]).max()) > 0.5
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=2e-4)
