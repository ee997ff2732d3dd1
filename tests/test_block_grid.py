"""Block-layout grid encoder: exact equality vs reference-semantics encoder
on uncapped (fully dense) levels; sanity on capped levels."""

import jax
import jax.numpy as jnp
import numpy as np

from geneface_tpu.ops import grid_encode, init_grid_embeddings, make_grid_meta
from geneface_tpu.ops.encoders import (
    block_grid_encode,
    build_block_tables,
    make_block_grid_meta,
)


def _setup(input_dim, log2_hash, desired, levels=4):
    meta = make_grid_meta(
        input_dim=input_dim, num_levels=levels, level_dim=2, base_resolution=4,
        log2_hashmap_size=log2_hash, desired_resolution=desired, gridtype="tiled",
    )
    bmeta = make_block_grid_meta(meta)
    emb = init_grid_embeddings(jax.random.PRNGKey(0), meta) * 1e4
    tables = build_block_tables(emb, bmeta, dtype=jnp.float32)
    return meta, bmeta, emb, tables


def test_block_encode_matches_reference_on_dense_levels():
    # log2_hashmap 16 >> table sizes -> every level dense, no wrap:
    # block layout must be numerically identical to the reference semantics
    meta, bmeta, emb, tables = _setup(3, 16, 32)
    pts = jnp.asarray(np.random.RandomState(0).rand(64, 3), jnp.float32)
    ref = grid_encode(pts, emb, meta)
    fast = block_grid_encode(pts, tables, bmeta)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_block_encode_2d():
    meta, bmeta, emb, tables = _setup(2, 16, 32)
    pts = jnp.asarray(np.random.RandomState(1).rand(32, 2), jnp.float32)
    ref = grid_encode(pts, emb, meta)
    fast = block_grid_encode(pts, tables, bmeta)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_block_encode_capped_levels_behave():
    # capped (wrapped) levels: different aliasing than reference but must be
    # finite, OOB-zero, and continuous at cell boundaries
    meta, bmeta, emb, tables = _setup(3, 7, 64, levels=5)
    pts = jnp.asarray(np.random.RandomState(2).rand(128, 3), jnp.float32)
    out = block_grid_encode(pts, tables, bmeta)
    assert np.all(np.isfinite(np.asarray(out)))
    oob = block_grid_encode(jnp.array([[1.5, 0.2, 0.2]]), tables, bmeta)
    np.testing.assert_allclose(np.asarray(oob), 0.0)
    # continuity: two points straddling a cell boundary by eps give close outputs
    eps = 1e-5
    scale = 2 ** np.ceil(np.log2(8))
    p0 = jnp.array([[0.5 - eps, 0.3, 0.3]])
    p1 = jnp.array([[0.5 + eps, 0.3, 0.3]])
    a, b = block_grid_encode(p0, tables, bmeta), block_grid_encode(p1, tables, bmeta)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.0)


def test_block_encode_grads_reach_canonical():
    meta, bmeta, emb, _ = _setup(3, 16, 16)  # all levels dense
    pts = jnp.asarray(np.random.RandomState(3).rand(16, 3), jnp.float32)

    def loss(e):
        tables = build_block_tables(e, bmeta, dtype=jnp.float32)
        return block_grid_encode(pts, tables, bmeta).sum()

    g = jax.grad(loss)(emb)
    assert float(jnp.abs(g).sum()) > 0
    # compare against reference-encoder gradient on the dense config
    g_ref = jax.grad(lambda e: grid_encode(pts, e, meta).sum())(emb)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


def test_fast_grid_encode_custom_vjp_matches_reference():
    from geneface_tpu.ops.encoders import fast_grid_encode

    meta, bmeta, emb, _ = _setup(3, 16, 16)  # all dense -> exact parity
    pts = jnp.asarray(np.random.RandomState(5).rand(24, 3), jnp.float32)
    g_out = jnp.asarray(np.random.RandomState(6).randn(24, meta.output_dim),
                        jnp.float32)

    def loss_fast(p, e):
        return jnp.sum(fast_grid_encode(p, e, bmeta) * g_out)

    def loss_ref(p, e):
        return jnp.sum(grid_encode(p, e, meta) * g_out)

    v_fast = float(loss_fast(pts, emb))
    v_ref = float(loss_ref(pts, emb))
    np.testing.assert_allclose(v_fast, v_ref, rtol=2e-3)

    gp_f, ge_f = jax.grad(loss_fast, argnums=(0, 1))(pts, emb)
    gp_r, ge_r = jax.grad(loss_ref, argnums=(0, 1))(pts, emb)
    np.testing.assert_allclose(np.asarray(ge_f), np.asarray(ge_r),
                               rtol=1e-2, atol=1e-3)
    # fast tables are bf16 by design -> input grads carry ~1e-2 relative
    # quantization noise vs the f32 reference
    np.testing.assert_allclose(np.asarray(gp_f), np.asarray(gp_r),
                               rtol=5e-2, atol=1e-1)


def test_fast_grid_encode_smoothstep_grads():
    from geneface_tpu.ops.encoders import fast_grid_encode, make_block_grid_meta

    meta = make_grid_meta(input_dim=2, num_levels=3, level_dim=2,
                          base_resolution=4, log2_hashmap_size=16,
                          desired_resolution=16, gridtype="tiled",
                          interpolation="smoothstep")
    bmeta = make_block_grid_meta(meta)
    emb = init_grid_embeddings(jax.random.PRNGKey(0), meta) * 1e4
    pts = jnp.asarray(np.random.RandomState(7).rand(12, 2), jnp.float32)
    gp_f = jax.grad(lambda p: fast_grid_encode(p, emb, bmeta).sum())(pts)
    gp_r = jax.grad(lambda p: grid_encode(p, emb, meta).sum())(pts)
    # bf16 fast tables -> small quantization noise vs the f32 reference
    np.testing.assert_allclose(np.asarray(gp_f), np.asarray(gp_r),
                               rtol=5e-2, atol=1e-1)
