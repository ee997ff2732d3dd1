"""Sample compaction (ops/compaction.py) must be exact: with sufficient
capacity the compacted render path reproduces the padded path bit-for-bit
(same field evals in a different order), and with tight capacity it degrades
only by dropping tail samples."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geneface_tpu.ops.compaction import (
    compact_gather,
    expand_to_slabs,
    make_compact_plan,
)


def _random_valid(rng, n, s):
    counts = rng.integers(0, s + 1, size=n)
    return np.arange(s)[None, :] < counts[:, None], counts


def test_plan_roundtrip_exact():
    rng = np.random.default_rng(0)
    N, S = 64, 16
    valid, counts = _random_valid(rng, N, S)
    slab = np.where(valid, rng.normal(size=(N, S)), 0.0).astype(np.float32)
    cap = int(counts.sum()) + 5
    plan = make_compact_plan(jnp.asarray(valid), cap)
    assert int(plan.total) == counts.sum()

    compact = compact_gather(plan, jnp.asarray(slab))
    back = expand_to_slabs(plan, compact[:, None], N, S)[..., 0]
    np.testing.assert_array_equal(np.asarray(back), slab)


def test_plan_handles_zero_length_rays():
    valid = jnp.zeros((8, 4), bool).at[3, :2].set(True).at[6, :3].set(True)
    plan = make_compact_plan(valid, 16)
    ray = np.asarray(plan.ray)
    assert int(plan.total) == 5
    assert list(ray[:5]) == [3, 3, 6, 6, 6]


def test_capacity_overflow_drops_tail_only():
    rng = np.random.default_rng(1)
    N, S = 32, 8
    valid, counts = _random_valid(rng, N, S)
    total = int(counts.sum())
    cap = max(total - 7, 8)
    slab = np.where(valid, rng.normal(size=(N, S)), 0.0).astype(np.float32)
    plan = make_compact_plan(jnp.asarray(valid), cap)
    compact = compact_gather(plan, jnp.asarray(slab))
    back = np.asarray(expand_to_slabs(plan, compact[:, None], N, S)[..., 0])
    # the first `cap` samples in ray-major order survive; the rest are zero
    flat_order = [
        (i, k) for i in range(N) for k in range(int(counts[i]))
    ]
    kept = set(flat_order[:cap])
    for i in range(N):
        for k in range(S):
            expect = slab[i, k] if (i, k) in kept else 0.0
            assert back[i, k] == expect


def test_compacted_render_matches_padded():
    from geneface_tpu.models.radnerf.renderer import (
        OccupancyState,
        render_rays_radnerf,
    )

    rng = np.random.default_rng(2)
    N, S, H = 128, 16, 32
    occ_grid = jnp.asarray(rng.random((1, H, H, H)) < 0.3)
    occ = OccupancyState(
        density_grid=jnp.zeros((1, H**3)),
        occ_grid=occ_grid,
        mean_density=jnp.zeros(()),
    )
    rays_o = jnp.asarray(
        rng.normal(size=(N, 3)) * 0.1 + np.array([0, 0, 2.0]), jnp.float32
    )
    d = -rays_o + rng.normal(size=(N, 3)) * 0.05
    rays_d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)

    w = jnp.asarray(rng.normal(size=(3, 8)) * 0.3, jnp.float32)

    def make_field(w):
        def field_fn(xyz, dirs):
            h = jnp.tanh(xyz @ w)
            sigma = jax.nn.softplus(h[..., 0] * 3.0)
            rgb = jax.nn.sigmoid(h[..., 1:4])
            ambient = jnp.tanh(h[..., 4:6])
            return sigma, rgb, ambient

        return field_fn

    kwargs = dict(
        bound=1.0, min_near=0.05, dt_gamma=0.0, max_steps=S, grid_size=H,
        bg_color=0.5,
    )

    def render_loss(w, mspr):
        out = render_rays_radnerf(
            make_field(w), rays_o, rays_d, occ,
            mean_samples_per_ray=mspr, **kwargs,
        )
        loss = jnp.mean(out["rgb_map"]) + jnp.mean(out["ambient_sum"])
        return loss, out

    (l_pad, out_pad), g_pad = jax.value_and_grad(render_loss, has_aux=True)(
        w, None
    )
    (l_cmp, out_cmp), g_cmp = jax.value_and_grad(render_loss, has_aux=True)(
        w, float(S)  # capacity == full slab: nothing can drop
    )
    np.testing.assert_allclose(
        np.asarray(out_cmp["rgb_map"]), np.asarray(out_pad["rgb_map"]),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out_cmp["ambient_sum"]), np.asarray(out_pad["ambient_sum"]),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(float(l_cmp), float(l_pad), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g_cmp), np.asarray(g_pad), rtol=1e-5, atol=1e-6
    )


# ------------------------------------------------- blocked segmented scan ----
def test_segmented_cumsum_vs_oracle_and_reference_grad():
    """The blocked Hillis-Steele segmented scan (the associative_scan
    replacement — that op compiles catastrophically on the TPU toolchain,
    docs/perf_notes.md) must match a per-element oracle across block
    boundaries and arbitrary tails, including gradients."""
    import jax

    from geneface_tpu.ops.compaction import segmented_cumsum

    rng = np.random.RandomState(0)
    for M, W in ((1, ()), (511, ()), (512, ()), (513, ()), (1537, (6,))):
        v = rng.randn(M, *W).astype(np.float32)
        s = rng.rand(M) < 0.1
        s[0] = True
        out = np.zeros_like(v)
        acc = np.zeros(W, np.float32)
        for i in range(M):
            if s[i]:
                acc = np.zeros(W, np.float32)
            acc = acc + v[i]
            out[i] = acc
        got = np.asarray(segmented_cumsum(jnp.asarray(v), jnp.asarray(s)))
        np.testing.assert_allclose(got, out, atol=1e-4 * max(1.0, np.abs(out).max()))

    # gradient parity vs the associative_scan formulation
    v = jnp.asarray(rng.randn(700).astype(np.float32))
    s = jnp.asarray(rng.rand(700) < 0.2)

    def ref(values, is_start):
        def op(a, b):
            fa, va = a
            fb, vb = b
            return fa | fb, vb + jnp.where(fb, 0.0, va)

        _, out = jax.lax.associative_scan(op, (is_start, values))
        return out

    g_new = jax.grad(lambda x: jnp.sum(segmented_cumsum(x, s) ** 2))(v)
    g_ref = jax.grad(lambda x: jnp.sum(ref(x, s) ** 2))(v)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref), atol=1e-4)


def test_waterfill_valid_budget_allocation():
    """waterfill_valid (round 5): truncation under budget pressure removes
    the deepest samples uniformly across rays (never whole late rays), stays
    prefix-dense, respects the capacity, and is a no-op with headroom."""
    import jax.numpy as jnp
    import numpy as np

    from geneface_tpu.ops.compaction import waterfill_valid

    rng = np.random.RandomState(0)
    N, S = 64, 16
    n = rng.randint(0, S + 1, N)
    slot = np.arange(S)[None]
    valid = jnp.asarray(slot < n[:, None])
    total = int(n.sum())

    # headroom -> identical
    out = np.asarray(waterfill_valid(valid, total + 32))
    np.testing.assert_array_equal(out, np.asarray(valid))

    for capacity in (total // 4, total // 2, total - 1):
        out = np.asarray(waterfill_valid(valid, capacity))
        kept = out.sum(-1)
        # capacity respected, subset of valid, prefix-dense
        assert out.sum() <= capacity
        assert np.all(out <= np.asarray(valid))
        assert np.all(out.cumsum(-1)[:, -1] == kept)  # mask is a prefix
        for i in range(N):
            assert np.all(out[i, : kept[i]]), "per-ray prefix broken"
        # uniform: every ray keeps at least min(n_i, q*) with q* the common
        # level -> no ray with samples is starved below the min kept level
        # among rays that wanted more
        want_more = n > kept
        if want_more.any():
            qstar = kept[want_more].min()
            assert np.all(kept[want_more] >= qstar)
            assert np.all(kept[want_more] <= qstar + 1)  # +1 partial level
        # nothing dropped while budget remained at a shallower level
        assert out.sum() >= min(capacity - N, total)  # partial-level slack
