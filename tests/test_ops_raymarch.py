"""Ray-march + composite tests vs per-ray numpy oracles of the CUDA kernels."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from geneface_tpu.ops import (
    composite_rays,
    dilate_grid3d,
    march_rays_train,
    morton3d,
    morton3d_invert,
    near_far_from_aabb,
    packbits,
)

SQRT3 = math.sqrt(3.0)


# ------------------------------------------------------------- near/far ----
def _near_far_oracle(o, d, aabb, min_near):
    """Per-ray slab test, kernel_near_far_from_aabb:92-146."""
    near_t, far_t = -np.inf, np.inf
    for ax in range(3):
        t0 = (aabb[ax] - o[ax]) / d[ax]
        t1 = (aabb[ax + 3] - o[ax]) / d[ax]
        lo, hi = min(t0, t1), max(t0, t1)
        if lo > far_t or near_t > hi:
            return None
        near_t, far_t = max(near_t, lo), min(far_t, hi)
    return max(near_t, min_near), far_t


def test_near_far_from_aabb():
    rng = np.random.RandomState(0)
    o = rng.randn(64, 3).astype(np.float32) * 2
    d = rng.randn(64, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    aabb = np.array([-1, -1, -1, 1, 1, 1], np.float32)
    nears, fars = near_far_from_aabb(jnp.asarray(o), jnp.asarray(d), jnp.asarray(aabb), 0.05)
    nears, fars = np.asarray(nears), np.asarray(fars)
    for i in range(64):
        oracle = _near_far_oracle(o[i], d[i], aabb, 0.05)
        if oracle is None:
            assert nears[i] > 1e30 and fars[i] > 1e30, i
        else:
            np.testing.assert_allclose(nears[i], oracle[0], atol=1e-4)
            np.testing.assert_allclose(fars[i], oracle[1], atol=1e-4)


# ----------------------------------------------------------------- march ----
def _march_oracle(o, d, grid, bound, dt_gamma, max_steps, near, far, noise, H):
    """Single-ray walk, kernel_march_rays_train:353-518 (cascade=1)."""
    dt_max = 2 * SQRT3 / H
    dt_min = min(dt_max, 2 * SQRT3 / max_steps)
    dt_of = lambda t: np.clip(t * dt_gamma, dt_min, dt_max)
    t = near + dt_of(near) * noise
    samples = []
    iters = 0
    while t < far and len(samples) < max_steps and iters < 10000:
        iters += 1
        pos = np.clip(o + t * d, -bound, bound)
        dt = dt_of(t)
        mip_bound = min(1.0, bound)
        cell = np.clip(0.5 * (pos / mip_bound + 1) * H, 0, H - 1).astype(int)
        occ = grid[0, cell[0], cell[1], cell[2]]
        if occ:
            samples.append((t, dt, t + dt))
            t += dt
        else:
            nxt = (((cell + 0.5 + 0.5 * np.sign(d)) * (2.0 / H) - 1) * mip_bound - pos) / d
            tt = t + max(0.0, np.min(nxt))
            while True:
                t += dt_of(t)
                if t >= tt:
                    break
    return samples


def test_march_rays_train_vs_oracle():
    H, max_steps, bound, dt_gamma = 16, 16, 1.0, 1.0 / 256
    rng = np.random.RandomState(7)
    grid = rng.rand(1, H, H, H) > 0.6  # sparse occupancy

    N = 32
    o = np.zeros((N, 3), np.float32)
    o[:, 2] = -2.5
    o[:, :2] = rng.randn(N, 2) * 0.3
    d = np.tile(np.array([0, 0, 1.0], np.float32), (N, 1))
    d[:, :2] = rng.randn(N, 2) * 0.2
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    aabb = np.array([-bound] * 3 + [bound] * 3, np.float32)
    noises = rng.rand(N).astype(np.float32)

    nears, fars = near_far_from_aabb(jnp.asarray(o), jnp.asarray(d), jnp.asarray(aabb), 0.05)
    res = march_rays_train(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(grid),
        nears, fars, jnp.asarray(noises),
        bound=bound, dt_gamma=dt_gamma, max_steps=max_steps,
        cascade=1, grid_size=H, march_iters=128,
    )
    ts, dts, valid, dpts = (np.asarray(a) for a in (res.ts, res.dts, res.valid, res.depth_ts))
    nears_np, fars_np = np.asarray(nears), np.asarray(fars)

    n_checked = 0
    for i in range(N):
        if nears_np[i] > 1e30:
            assert valid[i].sum() == 0
            continue
        oracle = _march_oracle(
            o[i], d[i], grid, bound, dt_gamma, max_steps,
            nears_np[i], fars_np[i], noises[i], H,
        )
        k = valid[i].sum()
        assert k == len(oracle), f"ray {i}: {k} vs oracle {len(oracle)}"
        for s, (t_o, dt_o, dp_o) in enumerate(oracle):
            np.testing.assert_allclose(ts[i, s], t_o, atol=1e-4)
            np.testing.assert_allclose(dts[i, s], dt_o, atol=1e-4)
            np.testing.assert_allclose(dpts[i, s], dp_o, atol=1e-4)
        n_checked += len(oracle)
    assert n_checked > 50  # the scene actually produced samples


def test_march_empty_grid():
    H = 8
    grid = jnp.zeros((1, H, H, H), bool)
    o = jnp.array([[0.0, 0.0, -2.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    aabb = jnp.array([-1.0, -1, -1, 1, 1, 1])
    nears, fars = near_far_from_aabb(o, d, aabb)
    res = march_rays_train(o, d, grid, nears, fars, jnp.zeros(1),
                           grid_size=H, max_steps=16)
    assert int(res.valid.sum()) == 0


# ------------------------------------------------------------- composite ----
def _composite_oracle(sigmas, rgbs, dts, dpts, n_steps, T_thresh):
    """Single-ray walk, kernel_composite_rays_train_forward:604-690."""
    T, r, ws, dep, amb = 1.0, np.zeros(3), 0.0, 0.0, 0.0
    for k in range(n_steps):
        alpha = 1.0 - math.exp(-sigmas[k] * dts[k])
        w = alpha * T
        r = r + w * rgbs[k]
        dep += w * dpts[k]
        ws += w
        amb += 1.0  # ambient placeholder = 1 per included sample
        T *= 1.0 - alpha
        if T < T_thresh:
            break
    return r, ws, dep, amb


def test_composite_vs_oracle_with_early_out():
    rng = np.random.RandomState(0)
    N, S = 8, 16
    sigmas = rng.rand(N, S).astype(np.float32) * 30  # large => early out triggers
    rgbs = rng.rand(N, S, 3).astype(np.float32)
    dts = np.full((N, S), 0.2, np.float32)
    dpts = np.cumsum(dts, axis=1).astype(np.float32)
    n_valid = rng.randint(0, S + 1, N)
    valid = np.arange(S)[None] < n_valid[:, None]
    amb = np.ones((N, S), np.float32)

    out = composite_rays(
        jnp.asarray(sigmas), jnp.asarray(rgbs.transpose(2, 0, 1)), jnp.asarray(dts),
        jnp.asarray(dpts), jnp.asarray(valid), ambients=jnp.asarray(amb),
        T_thresh=1e-2,
    )
    for i in range(N):
        r, ws, dep, amb_o = _composite_oracle(
            sigmas[i], rgbs[i], dts[i], dpts[i], n_valid[i], 1e-2
        )
        np.testing.assert_allclose(np.asarray(out["image"][i]), r, atol=1e-4)
        np.testing.assert_allclose(float(out["weights_sum"][i]), ws, atol=1e-4)
        np.testing.assert_allclose(float(out["depth"][i]), dep, atol=1e-4)
        np.testing.assert_allclose(float(out["ambient_sum"][i]), amb_o, atol=1e-4)


def test_composite_backward_matches_cuda_formula():
    """Autodiff grads must equal the closed form at raymarching.cu:786-792."""
    rng = np.random.RandomState(1)
    N, S = 4, 8
    sigmas = jnp.asarray(rng.rand(N, S).astype(np.float32) * 3)
    rgbs = jnp.asarray(rng.rand(N, S, 3).astype(np.float32))
    dts = jnp.asarray(np.full((N, S), 0.15, np.float32))
    dpts = jnp.asarray(np.cumsum(np.asarray(dts), axis=1))
    valid = jnp.ones((N, S), bool)
    g_img = rng.rand(N, 3).astype(np.float32)
    g_ws = rng.rand(N).astype(np.float32)

    def loss(sig, rgb):
        out = composite_rays(sig, rgb.transpose(2, 0, 1), dts, dpts, valid, T_thresh=1e-4)
        return jnp.sum(out["image"] * g_img) + jnp.sum(out["weights_sum"] * g_ws)

    gs, gr = jax.grad(loss, argnums=(0, 1))(sigmas, rgbs)
    gs, gr = np.asarray(gs), np.asarray(gr)

    # oracle backward per kernel_composite_rays_train_backward
    sig, rgb, dt = map(np.asarray, (sigmas, rgbs, dts))
    for i in range(N):
        T, acc = 1.0, np.zeros(3)
        ws_acc = 0.0
        # forward finals
        Tf, rf, wsf = 1.0, np.zeros(3), 0.0
        for k in range(S):
            a = 1 - math.exp(-sig[i, k] * dt[i, k])
            w = a * Tf
            rf += w * rgb[i, k]
            wsf += w
            Tf *= 1 - a
            if Tf < 1e-4:
                break
        for k in range(S):
            a = 1 - math.exp(-sig[i, k] * dt[i, k])
            w = a * T
            acc = acc + w * rgb[i, k]
            ws_acc += w
            T *= 1 - a
            np.testing.assert_allclose(gr[i, k], g_img[i] * w, atol=1e-4)
            expect_gs = dt[i, k] * (
                np.dot(g_img[i], T * rgb[i, k] - (rf - acc))
                + g_ws[i] * (1 - wsf)
            )
            np.testing.assert_allclose(gs[i, k], expect_gs, atol=1e-4)
            if T < 1e-4:
                break


# ---------------------------------------------------------------- morton ----
def test_morton_roundtrip():
    rng = np.random.RandomState(2)
    c = rng.randint(0, 1024, (100, 3))
    codes = morton3d(jnp.asarray(c))
    back = np.asarray(morton3d_invert(codes))
    np.testing.assert_array_equal(back, c)
    # spot-check the interleave pattern
    assert int(morton3d(jnp.array([[1, 0, 0]]))[0]) == 1
    assert int(morton3d(jnp.array([[0, 1, 0]]))[0]) == 2
    assert int(morton3d(jnp.array([[0, 0, 1]]))[0]) == 4
    assert int(morton3d(jnp.array([[3, 3, 3]]))[0]) == 63


def test_packbits():
    dens = jnp.asarray(np.array([0.0, 5.0, 0.0, 0.0, 9.0, 0.0, 0.0, 0.0] * 2))
    bits = np.asarray(packbits(dens, 1.0))
    assert bits.tolist() == [0b00010010, 0b00010010]


def test_dilate_grid3d():
    g = np.zeros((1, 8, 8, 8), np.float32)
    g[0, 4, 4, 4] = 1.0
    out = np.asarray(dilate_grid3d(jnp.asarray(g)))
    assert out[0, 3:6, 3:6, 3:6].min() == 1.0
    assert out.sum() == 27.0


# ------------------------------------------------------- lattice march ----
def test_march_rays_lattice_matches_walk():
    """march_rays_lattice (parallel bit-packed) == march_rays_train (the
    oracle-tested walk) in the uniform-dt regime, including noise jitter,
    max_steps capping, and tight-box fast-forward."""
    from geneface_tpu.ops import lattice_span_cells, march_rays_lattice

    rng = np.random.RandomState(3)
    H, N = 32, 256
    r = (np.arange(H) + 0.5) / H * 2 - 1
    gx, gy, gz = np.meshgrid(r, r, r, indexing="ij")
    occ = (np.sqrt((gx - 0.1) ** 2 + gy**2 + (gz + 0.05) ** 2) < 0.35) | (
        np.sqrt((gx + 0.5) ** 2 + (gy - 0.3) ** 2 + gz**2) < 0.2
    )
    occ_grid = jnp.asarray(occ[None])
    o = rng.randn(N, 3).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 1.8
    d = -o + 0.3 * rng.randn(N, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    aabb = jnp.asarray([-1, -0.5, -1, 1, 0.5, 1], jnp.float32)
    nears, fars = near_far_from_aabb(jnp.asarray(o), jnp.asarray(d), aabb, 0.05)
    noise = jnp.asarray(rng.rand(N).astype(np.float32))
    kw = dict(bound=1.0, dt_gamma=1.0 / 256, max_steps=16, cascade=1, grid_size=H)
    m1 = march_rays_train(jnp.asarray(o), jnp.asarray(d), occ_grid, nears, fars, noise, **kw)
    span = lattice_span_cells(
        jnp.asarray(o), jnp.asarray(d), occ_grid, nears, fars,
        bound=1.0, grid_size=H, max_steps=16,
    )
    K = int(span) + 2
    m2 = march_rays_lattice(
        jnp.asarray(o), jnp.asarray(d), occ_grid, nears, fars, noise,
        lattice_K=K, **kw,
    )
    n1 = np.asarray(m1.valid.sum(-1))
    n2 = np.asarray(m2.valid.sum(-1))
    np.testing.assert_array_equal(n1, n2)
    t1, v1 = np.asarray(m1.ts), np.asarray(m1.valid)
    t2, v2 = np.asarray(m2.ts), np.asarray(m2.valid)
    for i in range(N):
        np.testing.assert_allclose(t1[i][v1[i]], t2[i][v2[i]], atol=1e-4)
    assert n1.sum() > 300  # scene actually exercised

    # undersized K truncates to an exact prefix (the CUDA buffer-full
    # behavior, raymarching.cu:446-457)
    m3 = march_rays_lattice(
        jnp.asarray(o), jnp.asarray(d), occ_grid, nears, fars, noise,
        lattice_K=max(K // 3, 4), **kw,
    )
    t3, v3 = np.asarray(m3.ts), np.asarray(m3.valid)
    for i in range(N):
        b = t3[i][v3[i]]
        np.testing.assert_allclose(t1[i][v1[i]][: len(b)], b, atol=1e-4)


def test_pack_occ_blocks_roundtrip():
    from geneface_tpu.ops import pack_occ_blocks

    rng = np.random.RandomState(0)
    H = 16
    occ = rng.rand(H, H, H) < 0.3
    blocks = np.asarray(pack_occ_blocks(jnp.asarray(occ)))
    B = H // 8
    for _ in range(200):
        x, y, z = rng.randint(0, H, 3)
        row = ((x >> 3) * B + (y >> 3)) * B + (z >> 3)
        word = ((x & 7) << 1) | ((y & 7) >> 2)
        bit = ((y & 3) << 3) | (z & 7)
        got = (int(blocks[row, word]) >> bit) & 1
        assert got == int(occ[x, y, z])


def test_lattice_paired_region_gather_exact():
    """The stride-2 overlapping-region gather (pack_occ_regions) emits the
    EXACT sample set of the per-sample aligned-block gather: one lattice
    step moves < 2 cells per axis, so both samples of a pair lie inside the
    first sample's core±2 halo region."""
    import numpy as np

    from geneface_tpu.ops import march_rays_lattice, near_far_from_aabb

    H, N = 32, 512
    rng = np.random.RandomState(7)
    occ = jnp.asarray(rng.rand(1, H, H, H) < 0.15)
    o = jnp.asarray(rng.randn(N, 3).astype(np.float32))
    o = o / jnp.linalg.norm(o, axis=-1, keepdims=True) * 2.5
    d = -o / jnp.linalg.norm(o, axis=-1, keepdims=True)
    d = d + jnp.asarray(rng.randn(N, 3).astype(np.float32)) * 0.1
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    nears, fars = near_far_from_aabb(o, d, aabb, 0.05)
    noise = jnp.asarray(rng.rand(N).astype(np.float32))
    kw = dict(bound=1.0, dt_gamma=0.0, max_steps=16, cascade=1, grid_size=H)
    for K in (2, 37, 48):
        a = march_rays_lattice(
            o, d, occ, nears, fars, noise, lattice_K=K, occ_block=8,
            paired=True, **kw
        )  # paired region path
        b = march_rays_lattice(
            o, d, occ, nears, fars, noise, lattice_K=K, occ_block=4, **kw
        )  # per-sample aligned-block path
        for name in ("ts", "dts", "valid", "depth_ts"):
            np.testing.assert_array_equal(
                np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
            )


def test_kdop_cull_is_conservative_and_tighter():
    """occupied_kdop/kdop_hit (the round-5 inference cull): every ray the
    marcher finds non-empty must pass the k-DOP test (conservativeness — a
    culled ray renders as exact background), and the k-DOP hit set is a
    subset of the AABB hit set (it is strictly tighter on round blobs)."""
    from geneface_tpu.models.radnerf.renderer import (
        kdop_hit,
        occupied_aabb,
        occupied_kdop,
    )
    from geneface_tpu.ops import march_rays_train

    rng = np.random.RandomState(11)
    H, N = 32, 512
    r = (np.arange(H) + 0.5) / H * 2 - 1
    gx, gy, gz = np.meshgrid(r, r, r, indexing="ij")
    occ = np.sqrt(gx**2 + (gy * 2.2) ** 2 + gz**2) < 0.4  # flattened ball
    occ_grid = jnp.asarray(occ[None])
    o = rng.randn(N, 3).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 1.8
    d = -o + 0.5 * rng.randn(N, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    aabb = jnp.asarray([-1, -0.5, -1, 1, 0.5, 1], jnp.float32)
    nears, fars = near_far_from_aabb(jnp.asarray(o), jnp.asarray(d), aabb, 0.05)
    m = march_rays_train(
        jnp.asarray(o), jnp.asarray(d), occ_grid, nears, fars,
        jnp.zeros(N), bound=1.0, dt_gamma=1.0 / 256, max_steps=16,
        cascade=1, grid_size=H,
    )
    nonempty = np.asarray(m.valid.sum(-1)) > 0
    kdop = occupied_kdop(occ_grid, 1.0)
    hit_k = np.asarray(kdop_hit(jnp.asarray(o), jnp.asarray(d), kdop, 0.05))
    # conservativeness: marched samples => kdop hit
    assert np.all(hit_k[nonempty]), "kdop culled a non-empty ray"
    # tighter than (a subset of, and strictly smaller on this blob than)
    # the AABB slab test
    tight = occupied_aabb(occ_grid, 1.0)
    tn, _ = near_far_from_aabb(jnp.asarray(o), jnp.asarray(d), tight, 0.05)
    hit_a = np.asarray(tn) < 1e30
    assert np.all(hit_a | ~hit_k), "kdop hit a ray the AABB rejected"
    assert hit_k.sum() < hit_a.sum()
    assert nonempty.sum() > 50

    # empty grid: falls back to the full AABB k-DOP (nothing crashes,
    # everything that hits the training box is kept)
    kd0 = occupied_kdop(jnp.zeros_like(occ_grid), 1.0)
    hit0 = np.asarray(kdop_hit(jnp.asarray(o), jnp.asarray(d), kd0, 0.05))
    box_hit = np.asarray(nears) < 1e30
    assert np.all(hit0[box_hit])
