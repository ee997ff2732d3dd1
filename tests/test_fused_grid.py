"""Fused (grouped-row) grid encoder vs oracles.

- dense level-0 group must match the reference-semantics ``grid_encode``
  bit-for-bit (same canonical table, same interpolation);
- the custom VJP must match plain autodiff through the forward;
- out-of-range inputs produce zeros and zero grads;
- the dense level is continuous across cell boundaries.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from geneface_tpu.ops.encoders import grid_encode, make_grid_meta  # noqa: E402
from geneface_tpu.ops.fused_grid import (  # noqa: E402
    _forward,
    fused_grid_encode,
    init_fused_embeddings,
    make_fused_grid_meta,
)


def make_meta(D=3, L=5, C=4, cap=9, desired=128):
    return make_grid_meta(
        input_dim=D, num_levels=L, level_dim=C, base_resolution=16,
        log2_hashmap_size=cap, desired_resolution=desired, gridtype="tiled",
    )


@pytest.mark.parametrize("D", [2, 3])
def test_dense_level0_matches_reference(D):
    meta1 = make_grid_meta(
        input_dim=D, num_levels=1, level_dim=4, base_resolution=16,
        log2_hashmap_size=14, desired_resolution=16, gridtype="tiled",
    )
    fmeta = make_fused_grid_meta(meta1)
    assert fmeta.modes == ("dense",)
    rng = jax.random.PRNGKey(0)
    params = init_fused_embeddings(rng, fmeta)
    side = fmeta.dense_sides[0]
    # reference encoder reads the same canonical table (level offsets = 0)
    emb = jnp.zeros((meta1.n_entries, 4)).at[: side**D].set(params["group_0"])
    x = jax.random.uniform(jax.random.PRNGKey(1), (257, D))
    np.testing.assert_allclose(
        np.asarray(fused_grid_encode(x, params, fmeta)),
        np.asarray(grid_encode(x, emb, meta1)),
        rtol=1e-6, atol=1e-6,
    )


@pytest.mark.parametrize(
    "D,L,ug,run",
    [(3, 5, 0, 1), (2, 8, 0, 1), (3, 8, 4, 1), (3, 8, 4, 2)],
)
def test_custom_vjp_matches_autodiff(D, L, ug, run):
    meta = make_meta(D=D, L=L)
    fmeta = make_fused_grid_meta(meta, ungroup_coarse=ug, coarse_run=run)
    params = init_fused_embeddings(jax.random.PRNGKey(0), fmeta, std=0.5)
    x = jax.random.uniform(jax.random.PRNGKey(1), (123, D))
    cot = jax.random.normal(jax.random.PRNGKey(2), (123, meta.output_dim))

    def loss_custom(x, p):
        return jnp.sum(fused_grid_encode(x, p, fmeta) * cot)

    def loss_plain(x, p):
        return jnp.sum(_forward(x, p, fmeta) * cot)

    gx1, gp1 = jax.grad(loss_custom, argnums=(0, 1))(x, params)
    gx2, gp2 = jax.grad(loss_plain, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=2e-4, atol=2e-5)
    for k in gp1:
        np.testing.assert_allclose(np.asarray(gp1[k]), np.asarray(gp2[k]),
                                   rtol=2e-4, atol=2e-5)


def test_forward_matches_plain_forward():
    meta = make_meta()
    fmeta = make_fused_grid_meta(meta)
    params = init_fused_embeddings(jax.random.PRNGKey(0), fmeta, std=0.5)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    np.testing.assert_allclose(
        np.asarray(fused_grid_encode(x, params, fmeta)),
        np.asarray(_forward(x, params, fmeta)),
    )


def test_oob_zeros_and_zero_grads():
    meta = make_meta()
    fmeta = make_fused_grid_meta(meta)
    params = init_fused_embeddings(jax.random.PRNGKey(0), fmeta, std=0.5)
    x = jnp.asarray([[1.5, 0.5, 0.5], [-0.1, 0.2, 0.3], [0.5, 0.5, 0.5]])
    out = fused_grid_encode(x, params, fmeta)
    assert np.all(np.asarray(out[:2]) == 0.0)
    assert np.any(np.asarray(out[2]) != 0.0)
    gx = jax.grad(lambda x: jnp.sum(fused_grid_encode(x, params, fmeta)))(x)
    assert np.all(np.asarray(gx[:2]) == 0.0)


def test_dense_level_continuity():
    """Level 0 must be continuous across cell boundaries (parity copies)."""
    meta = make_meta(L=1, desired=16, cap=14)  # level 0 dense
    fmeta = make_fused_grid_meta(meta)
    assert fmeta.modes == ("dense",)
    params = init_fused_embeddings(jax.random.PRNGKey(0), fmeta, std=0.5)
    # straddle a cell boundary along x at fine spacing
    eps = 1e-6
    scale = 16 - 1.0  # level-0 scale (base_res 16)
    boundary = (3 + 0.5) / scale  # cell edge in input space (off=0.5)
    x_lo = jnp.asarray([[boundary - eps, 0.37, 0.61]])
    x_hi = jnp.asarray([[boundary + eps, 0.37, 0.61]])
    a = np.asarray(fused_grid_encode(x_lo, params, fmeta))
    b = np.asarray(fused_grid_encode(x_hi, params, fmeta))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_capacity_parity():
    """Group tables hold the same parameter budget as the canonical capped
    levels they replace."""
    meta = make_meta(D=3, L=5)
    fmeta = make_fused_grid_meta(meta)
    params = init_fused_embeddings(jax.random.PRNGKey(0), fmeta)
    for gi, g in enumerate(fmeta.groups):
        if fmeta.modes[gi] != "hash":
            continue
        canonical = sum(
            meta.offsets[l + 1] - meta.offsets[l] for l in g
        ) * meta.level_dim
        got = params[f"group_{gi}"].size
        assert abs(got - canonical) <= len(g) * (1 << 3) * meta.level_dim


def test_ungroup_coarse_groups_and_ambient_override():
    """``ungroup_coarse`` gives the N coarsest non-dense levels their own
    tables, and the model-level ``ambient_ungroup_coarse`` override (-1 =
    follow) decouples the two grids' layouts (round-5 quality knob)."""
    meta = make_meta(D=3, L=6)
    f0 = make_fused_grid_meta(meta)
    f2 = make_fused_grid_meta(meta, ungroup_coarse=2)
    assert f2.groups[:3] == ((0,), (1,), (2,))
    assert len(f2.groups) == len(f0.groups) + 2
    # ungrouped coarse levels with small sides come out dense -> exact
    assert f2.modes[1] in ("dense", "hash")

    from geneface_tpu.models.radnerf import RADNeRF

    kw = dict(
        cond_out_dim=16, cond_win_size=1, smo_win_size=3,
        log2_hashmap_size=9, desired_resolution=64,
        hidden_dim_ambient=16, hidden_dim_sigma=16, geo_feat_dim=16,
        hidden_dim_color=16, individual_embedding_num=10,
        individual_embedding_dim=4,
    )
    cond = jnp.zeros((3, 1, 204))
    xyz = jnp.zeros((8, 3))
    dirs = jnp.zeros((8, 3))

    def shapes(model):
        p = model.init(
            jax.random.PRNGKey(0), cond, xyz, dirs, method=model.init_all
        )
        return jax.tree_util.tree_map(jnp.shape, p["params"])

    s_follow = shapes(RADNeRF(fused_ungroup_coarse=2, **kw))
    s_pos = shapes(
        RADNeRF(fused_ungroup_coarse=2, ambient_ungroup_coarse=0, **kw)
    )
    assert s_follow["pos_embeddings"] == s_pos["pos_embeddings"]
    assert s_follow["ambient_embeddings"] != s_pos["ambient_embeddings"]
