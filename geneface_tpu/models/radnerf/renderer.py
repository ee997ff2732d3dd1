"""Occupancy-grid machinery + render orchestration for RAD-NeRF fields.

Functional re-design of ``modules/radnerfs/renderer.py``: the torch
``NeRFRenderer`` holds mutable buffers (density grid, bitfield, step
counters) and syncs counts to host every step; here the occupancy state is an
explicit pytree threaded through jitted functions — no host syncs, no mutable
module state (SURVEY §7 hard part 4: "the D2H-free training loop").

Differences from the CUDA design, by construction of the TPU marcher:
- no ``step_counter``/``mean_count`` ring: the padded marcher needs no
  capacity estimate (``renderer.py:98-101`` obsolete);
- the bitfield is a bool grid ``[cascade, H, H, H]`` indexed directly
  (morton packing was a GPU cache trick, see ``ops/morton.py``).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from geneface_tpu.ops import (
    composite_rays,
    dilate_grid3d,
    lattice_span_cells,
    march_rays_lattice,
    march_rays_train,
    near_far_from_aabb,
)
from geneface_tpu.ops.compaction import (
    compact_gather,
    make_compact_plan,
    segment_sums_cm,
    segmented_cumsum,
    waterfill_valid,
)

__all__ = [
    "OccupancyState",
    "TorsoOccupancyState",
    "init_occupancy",
    "init_torso_occupancy",
    "mark_untrained_grid",
    "update_extra_state",
    "update_torso_occupancy",
    "render_rays_radnerf",
    "render_rays_radnerf_torso",
    "make_aabb",
    "occupied_kdop",
    "kdop_hit",
    "torso_occupancy_mask",
]


class OccupancyState(NamedTuple):
    """Density EMA grid + derived boolean occupancy.

    density_grid: [cascade, H³] fp32; cells never seen by any training camera
    hold -1 (``renderer.py:196``); others are EMA-decayed max densities.
    occ_grid: [cascade, H, H, H] bool = density > min(mean_density, thresh).
    mean_density: scalar fp32 running mean of clamped densities.
    """

    density_grid: jax.Array
    occ_grid: jax.Array
    mean_density: jax.Array


def make_aabb(bound: float) -> jax.Array:
    """Training AABB: full cube in x/z, half-height in y — a face bust fills
    the lower half (``renderer.py:79-82``)."""
    b = float(bound)
    return jnp.asarray([-b, -b / 2, -b, b, b / 2, b], jnp.float32)


def cascade_of(bound: float) -> int:
    return 1 + math.ceil(math.log2(max(bound, 1.0)))


def init_occupancy(grid_size: int, bound: float) -> OccupancyState:
    C = cascade_of(bound)
    return OccupancyState(
        density_grid=jnp.zeros((C, grid_size**3), jnp.float32),
        occ_grid=jnp.zeros((C, grid_size, grid_size, grid_size), bool),
        mean_density=jnp.zeros((), jnp.float32),
    )


def _cell_centers(grid_size: int) -> np.ndarray:
    """[H³, 3] cell-center coordinates in [-1, 1] (x-major / C order)."""
    r = np.arange(grid_size, dtype=np.float32)
    xx, yy, zz = np.meshgrid(r, r, r, indexing="ij")
    coords = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3)
    return 2.0 * coords / (grid_size - 1) - 1.0


def mark_untrained_grid(
    occ: OccupancyState,
    poses: np.ndarray,  # [B, 4, 4] c2w
    intrinsics,  # (fx, fy, cx, cy)
    grid_size: int,
    bound: float,
) -> OccupancyState:
    """Mark cells outside every training camera frustum with density -1
    (``renderer.py:129-196``). Host-side numpy — runs once at startup."""
    fx, fy, cx, cy = [float(v) for v in intrinsics]
    poses = np.asarray(poses, np.float32)
    C = occ.density_grid.shape[0]
    world = _cell_centers(grid_size)  # [N, 3]
    grid = np.asarray(occ.density_grid).copy()
    for cas in range(C):
        cas_bound = min(2**cas, bound)
        half_cell = cas_bound / grid_size
        pts = world * (cas_bound - half_cell)  # [N, 3]
        covered = np.zeros(len(pts), np.int64)
        for head in range(0, len(poses), 64):
            p = poses[head : head + 64]
            rel = pts[None, :, :] - p[:, None, :3, 3]
            cam = np.einsum("bnd,bdk->bnk", rel, p[:, :3, :3])  # world→cam
            mask = (
                (cam[..., 2] > 0)
                & (np.abs(cam[..., 0]) < cx / fx * cam[..., 2] + half_cell * 2)
                & (np.abs(cam[..., 1]) < cy / fy * cam[..., 2] + half_cell * 2)
            )
            covered += mask.sum(0)
        grid[cas, covered == 0] = -1.0
    return occ._replace(density_grid=jnp.asarray(grid))


@partial(
    jax.jit,
    static_argnames=("density_fn", "grid_size", "bound", "density_thresh", "chunks"),
)
def update_extra_state(
    density_fn: Callable[[jax.Array], jax.Array],
    occ: OccupancyState,
    rng: jax.Array,
    *,
    grid_size: int,
    bound: float,
    density_thresh: float,
    decay: float = 0.95,
    chunks: int = 16,
) -> OccupancyState:
    """Periodic density re-evaluation → dilation → EMA → threshold
    (``renderer.py:199-260``). ``density_fn(xyz [M,3]) -> sigma [M]`` closes
    over params and a (random-frame) condition feature.

    Fully on-device: the reference's ``mean_density ... .item()`` host sync is
    replaced by keeping the scalar in the state pytree.
    """
    C = occ.density_grid.shape[0]
    H = grid_size
    world = jnp.asarray(_cell_centers(H))  # [H^3, 3]

    new_rows = []
    for cas in range(C):
        cas_bound = min(2**cas, bound)
        half_cell = cas_bound / H
        pts = world * (cas_bound - half_cell)
        noise = (jax.random.uniform(jax.random.fold_in(rng, cas), pts.shape) * 2 - 1)
        pts = pts + noise * half_cell
        # chunked sweep to bound peak memory (reference chunks at S=128 too)
        pts_c = pts.reshape(chunks, -1, 3)
        sigmas = jax.lax.map(density_fn, pts_c).reshape(-1)
        new_rows.append(sigmas)
    tmp = jnp.stack(new_rows)  # [C, H^3]

    # 3^3 max-pool dilation in grid space (reference: morton3D_dilation)
    tmp = dilate_grid3d(tmp.reshape(C, H, H, H)).reshape(C, -1)

    valid = (occ.density_grid >= 0) & (tmp >= 0)
    density = jnp.where(
        valid, jnp.maximum(occ.density_grid * decay, tmp), occ.density_grid
    )
    mean_density = jnp.mean(jnp.maximum(density, 0.0))
    thresh = jnp.minimum(mean_density, density_thresh)
    occ_grid = (density > thresh).reshape(C, H, H, H)
    return OccupancyState(density, occ_grid, mean_density)


def occupied_aabb(occ_grid: jax.Array, bound: float) -> jax.Array:
    """Tight world AABB of occupied fine cells, one-cell margin → [6].

    Inference ray culling (the TPU analog of the reference's alive-ray
    compaction, ``renderer.py:328-351``): on a full frame most rays never
    touch occupied space; a slab test against this box rejects them before
    the march. Falls back to the full box when the grid is empty. On-device
    (reductions only), so it traces into the jitted render.
    """
    g = occ_grid[0]
    H = g.shape[0]
    idx = jnp.arange(H, dtype=jnp.float32)
    mip_bound = min(1.0, bound)

    lohi = []
    for ax in ((1, 2), (0, 2), (0, 1)):
        any_i = jnp.any(g, axis=ax)
        lo = jnp.min(jnp.where(any_i, idx, jnp.float32(H)))
        hi = jnp.max(jnp.where(any_i, idx, jnp.float32(-1)))
        lohi.append((lo, hi))
    empty = ~jnp.any(g)
    los = jnp.stack(
        [((lh[0] - 1.0) / H * 2.0 - 1.0) * mip_bound for lh in lohi]
    )
    his = jnp.stack(
        [((lh[1] + 2.0) / H * 2.0 - 1.0) * mip_bound for lh in lohi]
    )
    full = make_aabb(bound)
    los = jnp.where(empty, full[:3], jnp.maximum(los, full[:3]))
    his = jnp.where(empty, full[3:], jnp.minimum(his, full[3:]))
    return jnp.concatenate([los, his])


#: k-DOP direction set for inference ray culling: 3 axes + 6 face
#: diagonals + 4 body diagonals (unnormalized; slab math is scale-free).
_KDOP_DIRS = np.asarray(
    [
        [1, 0, 0], [0, 1, 0], [0, 0, 1],
        [1, 1, 0], [1, -1, 0], [1, 0, 1], [1, 0, -1], [0, 1, 1], [0, 1, -1],
        [1, 1, 1], [1, 1, -1], [1, -1, 1], [1, -1, -1],
    ],
    np.float32,
)


def occupied_kdop(occ_grid: jax.Array, bound: float) -> tuple[jax.Array, jax.Array]:
    """13-slab k-DOP bounds of the occupied fine cells → (lo [13], hi [13]).

    Tighter inference ray culling than :func:`occupied_aabb` (VERDICT r4 #1:
    a face blob's screen silhouette is round; the AABB slab test alone keeps
    ~21% pure-background rays in the capacity budget; the diagonal slabs cut
    that to a few percent). Conservative by construction: bounds are over
    cell centers plus the cell's half-extent projected onto each direction,
    so every occupied cell lies fully inside every slab — culled rays are
    exactly rays the marcher would find empty. Compute once per occupancy
    update (it only depends on the grid), not per frame.
    """
    g = occ_grid[0]
    H = g.shape[0]
    mip_bound = min(1.0, bound)
    centers = jnp.asarray(_cell_centers(H), jnp.float32) * mip_bound
    dirs = jnp.asarray(_KDOP_DIRS)
    proj = centers @ dirs.T  # [H^3, 13]
    occ = g.reshape(-1, 1)
    big = jnp.float32(1e30)
    lo = jnp.min(jnp.where(occ, proj, big), axis=0)
    hi = jnp.max(jnp.where(occ, proj, -big), axis=0)
    # half-extent of one cell projected on each direction (+1-cell margin,
    # matching occupied_aabb's margin)
    half = (2.0 * mip_bound / H) * jnp.sum(jnp.abs(dirs), axis=-1)
    lo, hi = lo - half, hi + half
    # empty grid -> full training AABB, expressed as k-DOP of the cube
    full = make_aabb(bound)
    corners = jnp.stack(
        [
            jnp.stack([full[3 * (i % 2)], full[1 + 3 * ((i >> 1) % 2)],
                       full[2 + 3 * ((i >> 2) % 2)]])
            for i in range(8)
        ]
    )  # [8, 3] box corners
    cproj = corners @ dirs.T
    empty = ~jnp.any(g)
    lo = jnp.where(empty, jnp.min(cproj, axis=0), lo)
    hi = jnp.where(empty, jnp.max(cproj, axis=0), hi)
    return lo, hi


def kdop_hit(
    rays_o: jax.Array,  # [N, 3]
    rays_d: jax.Array,  # [N, 3]
    kdop: tuple[jax.Array, jax.Array],
    min_near: float,
    far_cap: jax.Array | float = jnp.inf,
) -> jax.Array:
    """[N] bool: ray segment [min_near, far_cap] intersects the k-DOP."""
    lo, hi = kdop
    dirs = jnp.asarray(_KDOP_DIRS)
    od = rays_o.astype(jnp.float32) @ dirs.T  # [N, 13]
    dd = rays_d.astype(jnp.float32) @ dirs.T
    dd = jnp.where(jnp.abs(dd) < 1e-12, 1e-12, dd)
    t0 = (lo[None, :] - od) / dd
    t1 = (hi[None, :] - od) / dd
    near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (jnp.maximum(near, min_near) <= jnp.minimum(far, far_cap)) & (
        far >= min_near
    )


def render_rays_radnerf(
    field_fn: Callable,  # (xyz [M,3], dirs [M,3]) -> (sigma, rgb, ambient_pos)
    rays_o: jax.Array,  # [N, 3]
    rays_d: jax.Array,  # [N, 3]
    occ: OccupancyState,
    *,
    bound: float,
    min_near: float,
    dt_gamma: float,
    max_steps: int,
    grid_size: int,
    bg_color: jax.Array | float = 1.0,
    rng: jax.Array | None = None,
    T_thresh: float = 1e-4,
    aabb: jax.Array | None = None,
    density_scale: float = 1.0,
    field_chunks: int = 1,
    mean_samples_per_ray: float | None = None,
    ray_capacity: int | None = None,
    lattice_K: int | None = None,
    march_paired: bool = False,
    compact_ks: bool = False,
    cull_kdop: tuple[jax.Array, jax.Array] | None = None,
) -> dict:
    """March + field eval + composite + background compose
    (``renderer.py:263-367``). One code path serves training and inference
    (the CUDA alive-ray loop existed only to keep compacted batches dense).

    ``field_fn`` closes over params / cond features / individual codes.
    Returns rgb_map [N,3], depth_map [N], weights_sum [N], ambient_sum [N],
    plus the march mask for diagnostics.

    ``lattice_K``: static lattice budget for the fully-parallel bit-packed
    march (``ops/raymarch.py march_rays_lattice``) — used when set and the
    uniform-dt single-cascade regime holds (every face config); the output
    then carries ``march_span`` (the K any ray actually needed) so callers
    can retune the bucket. Falls back to the while-loop walk otherwise.
    """
    N = rays_o.shape[0]
    if ray_capacity:
        # ---- inference ray culling: march only rays whose slab test hits
        # the tight occupied box; scatter results back to the frame. A
        # static-capacity index buffer keeps shapes compile-constant; if the
        # frame has more candidate rays than capacity the overflow renders
        # as background (choose capacity from the face's screen coverage).
        C = min(int(ray_capacity), N)
        if cull_kdop is not None:
            # precomputed 13-slab bounds: tighter than the AABB and free of
            # the per-frame occupied_aabb grid reduction
            hit = kdop_hit(rays_o, rays_d, cull_kdop, min_near)
        else:
            tight = occupied_aabb(occ.occ_grid, bound)
            tn, _tf = near_far_from_aabb(rays_o, rays_d, tight, min_near)
            hit = tn < 1e30
        # fill_value=N -> padded entries drop out of the scatter below
        (idx,) = jnp.nonzero(hit, size=C, fill_value=N)
        inner = render_rays_radnerf(
            field_fn,
            jnp.take(rays_o, jnp.minimum(idx, N - 1), axis=0),
            jnp.take(rays_d, jnp.minimum(idx, N - 1), axis=0),
            occ,
            bound=bound,
            min_near=min_near,
            dt_gamma=dt_gamma,
            max_steps=max_steps,
            grid_size=grid_size,
            bg_color=0.0,
            rng=rng,
            T_thresh=T_thresh,
            aabb=aabb,
            density_scale=density_scale,
            field_chunks=field_chunks,
            mean_samples_per_ray=mean_samples_per_ray,
            lattice_K=lattice_K,
        )
        # ONE packed scatter back to the frame (scatter cost is per-row)
        packed = jnp.concatenate(
            [
                inner["rgb_map"],
                inner["weights_sum"][:, None],
                inner["depth_map"][:, None],
                inner["ambient_sum"][:, None],
            ],
            axis=-1,
        )  # [C, 6]
        full = jnp.zeros((N, 6), jnp.float32).at[idx].set(packed, mode="drop")
        rgb, ws, depth, amb = (
            full[:, 0:3], full[:, 3], full[:, 4], full[:, 5]
        )
        image = jnp.clip(rgb + (1.0 - ws)[:, None] * bg_color, 0.0, 1.0)
        return {
            "rgb_map": image,
            "depth_map": depth,
            "weights_sum": ws,
            "ambient_sum": amb,
            "weights": None,
            "n_samples": inner.get("n_samples"),
            "n_culled_rays": N - jnp.sum(hit),
            "march_span": inner.get("march_span"),
        }
    if aabb is None:
        aabb = make_aabb(bound)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, min_near)
    nears = jax.lax.stop_gradient(nears)
    fars = jax.lax.stop_gradient(fars)

    noises = (
        jax.random.uniform(rng, (N,)) if rng is not None else jnp.zeros((N,))
    )
    cascade = occ.occ_grid.shape[0]
    _sqrt3 = math.sqrt(3.0)
    uniform_dt = cascade == 1 and (
        min(2.0 * _sqrt3 / grid_size, 2.0 * _sqrt3 / max_steps)
        == 2.0 * _sqrt3 / grid_size
    )
    march_span = None
    # lattice march only pairs with the compacted field eval: its slab width
    # is lattice_K (up to 128), so evaluating the full padded slab (the
    # mean_samples_per_ray=None path) would cost up to 8x the walk's
    # [N, max_steps] slab. Non-compact callers get the while-loop walk.
    if lattice_K and not uniform_dt:
        # the fast bit-packed lattice march requires single-cascade uniform
        # dt (every shipped face config: bound=1, grid_size>=max_steps) AND
        # the compacted field eval; warn at trace time rather than silently
        # marching up to 8x slower (reference handles cascades natively in
        # raymarching.cu:353-518 — multi-mip fast marching is future work).
        # Intentionally-disabled compaction (mean_samples_per_ray: 0) is a
        # supported config and does NOT warn.
        import logging

        logging.getLogger("geneface_tpu").warning(
            "lattice_K=%s requested but falling back to the while-loop walk "
            "(cascade=%d, uniform_dt=%s); bound>1 multi-mip configs take "
            "the slow path",
            lattice_K, cascade, uniform_dt,
        )
    if lattice_K and uniform_dt and mean_samples_per_ray:
        march = march_rays_lattice(
            rays_o,
            rays_d,
            occ.occ_grid,
            nears,
            fars,
            noises,
            bound=bound,
            dt_gamma=dt_gamma,
            max_steps=max_steps,
            cascade=1,
            grid_size=grid_size,
            lattice_K=int(lattice_K),
            # stride-2 region gather: a win at full-frame ray counts
            # (march 29.5 -> 16.7 ms at 200k rays), neutral at training
            # sizes; infer drivers opt in (see ops/raymarch.py)
            paired=march_paired,
        )
        march_span = march.span  # retune signal, computed inside the march
    else:
        march = march_rays_train(
            rays_o,
            rays_d,
            occ.occ_grid,
            nears,
            fars,
            noises,
            bound=bound,
            dt_gamma=dt_gamma,
            max_steps=max_steps,
            cascade=cascade,
            grid_size=grid_size,
        )
    S = march.ts.shape[-1]
    sample_capacity = None
    if mean_samples_per_ray:
        # compact-eval capacity: budget of real samples per step, padded to a
        # tile multiple and never beyond the full slab
        sample_capacity = min(
            int(-(-N * float(mean_samples_per_ray) // 1024) * 1024), N * S
        )
    if sample_capacity is not None:
        # ---- compacted path: field eval AND compositing on the ~sum(n)
        # valid samples only; never returns to [N, S] slabs. Per-ray
        # transmittance prefixes and output sums use segmented scans —
        # scatter-free, exact per segment (ops/compaction.py).
        # Ray grads are stopped here (no task consumes them; the reference
        # computes them in march_rays_train_backward:536 but discards them).
        # Waterfilling (round 5): under budget pressure drop the DEEPEST
        # samples uniformly across rays instead of whole late rays — a
        # capacity overflow otherwise rendered bottom-of-frame rows as
        # background (measured: the dominant fidelity loss of the old
        # truncation; see docs/perf_notes.md). No-op when capacity >= total.
        plan = make_compact_plan(
            waterfill_valid(march.valid, sample_capacity), sample_capacity
        )
        if march.ks is not None and compact_ks:
            # uniform-dt lattice route: the only per-SAMPLE datum is the
            # int lattice step. Four ks bytes pack per uint32 (S % 4 == 0
            # keeps packing within a ray), so the per-sample transport is a
            # quarter-length 1-D gather; everything else is per-RAY (one
            # [Mc]-row gather of the packed o/d/t_start record) plus fused
            # column math. The old path materialized a [N, S, 8] record
            # whose minor-8 axis lane-pads 16x on TPU — measured 31 ms of
            # the 512^2 frame against ~6 ms for this formulation.
            S_ = march.ks.shape[-1]
            assert S_ % 4 == 0
            k8 = march.ks.astype(jnp.uint32)
            kpack = (
                k8[:, 0::4]
                | (k8[:, 1::4] << 8)
                | (k8[:, 2::4] << 16)
                | (k8[:, 3::4] << 24)
            ).reshape(-1)  # [N*S/4]
            word = kpack[plan.src >> 2]  # [Mc] 1-D gather, 4x fewer indices
            shift = (plan.src & 3).astype(jnp.uint32) << 3
            k_c = ((word >> shift) & jnp.uint32(0xFF)).astype(jnp.float32)
            ray_rec = jnp.concatenate(
                [
                    jax.lax.stop_gradient(rays_o),
                    jax.lax.stop_gradient(rays_d),
                    march.t_start[:, None],
                ],
                axis=-1,
            )  # [N, 7]
            rr = ray_rec[plan.ray]  # [Mc, 7] — ONE per-ray row gather
            # the uniform dt is a compile-time constant in this regime
            dt_u = min(2.0 * _sqrt3 / grid_size, 2.0 * _sqrt3 / max_steps)
            ts_c = rr[:, 6] + k_c * dt_u
            dt_c = jnp.where(plan.valid, dt_u, 0.0)
            dep_c = jnp.where(plan.valid, ts_c + dt_u, 0.0)
            rd = rr[:, 3:6]
            xyz_c = jnp.clip(
                rr[:, 0:3] + ts_c[:, None] * rd, -bound, bound
            )
        else:
            # general route (non-uniform dt): ONE [Mc]-row record gather
            # for everything per-sample, materialized on the padded slab
            ro_b = jax.lax.stop_gradient(rays_o)[:, None, :]
            rd_b = jax.lax.stop_gradient(rays_d)[:, None, :]
            xyz_slab = ro_b + march.ts[..., None] * rd_b  # [N, S, 3]
            rec = jnp.concatenate(
                [
                    march.dts[..., None],
                    march.depth_ts[..., None],
                    xyz_slab,
                    jnp.broadcast_to(rd_b, xyz_slab.shape),
                ],
                axis=-1,
            )  # [N, S, 8]
            rec_c = compact_gather(plan, rec)  # [Mc, 8]
            dt_c, dep_c = rec_c[:, 0], rec_c[:, 1]
            xyz_c = jnp.clip(rec_c[:, 2:5], -bound, bound)
            rd = rec_c[:, 5:8]
        sigma_c, rgb_c, ambient_pos_c = field_fn(xyz_c, rd)
        sigma_c = sigma_c * density_scale
        amb_c = jnp.sum(jnp.abs(ambient_pos_c), axis=-1)

        # front-to-back compositing in compact space (semantics of
        # ops/raymarch.py composite_rays / raymarching.cu:604-690)
        sd = jnp.where(plan.valid, sigma_c * dt_c, 0.0)
        pref = segmented_cumsum(sd, plan.is_start)  # within-ray inclusive
        T_before = jnp.exp(-(pref - sd))
        alpha = 1.0 - jnp.exp(-sd)
        include = jax.lax.stop_gradient(T_before >= T_thresh) & plan.valid
        w = jnp.where(include, alpha * T_before, 0.0)
        # channel-MAJOR packing: stacked [Mc] columns stay dense, so the
        # segmented scan's shift passes move real bytes only (a [Mc, 6]
        # layout lane-pads 6 -> 128 on TPU and the scan drags 21x the data)
        cols = jnp.stack(
            [
                w,
                w * rgb_c[:, 0],
                w * rgb_c[:, 1],
                w * rgb_c[:, 2],
                w * dep_c,
                jnp.where(include, amb_c, 0.0),
            ],
            axis=0,
        )  # [6, Mc]
        sums = segment_sums_cm(plan, cols)  # [6, N]
        weights_sum = sums[0]
        image = sums[1:4].T + (1.0 - weights_sum)[:, None] * bg_color
        image = jnp.clip(image, 0.0, 1.0)
        span = jnp.maximum(fars - nears, 1e-6)
        depth = jnp.where(
            nears < 1e30, jnp.clip(sums[4] - nears, 0.0) / span, 0.0
        )
        return {
            "rgb_map": image,
            "depth_map": depth,
            "weights_sum": weights_sum,
            "ambient_sum": sums[5],
            "weights": None,
            "n_samples": plan.n,
            "march_span": march_span,
        }
    else:
        # differentiable sample positions (grads reach rays_o/rays_d as in
        # kernel_march_rays_train_backward:536)
        xyz = jnp.clip(
            rays_o[:, None, :] + march.ts[..., None] * rays_d[:, None, :],
            -bound,
            bound,
        )  # [N, S, 3]
        dirs = jnp.broadcast_to(rays_d[:, None, :], xyz.shape)

        xyz_flat = xyz.reshape(-1, 3)
        dirs_flat = dirs.reshape(-1, 3)
        if field_chunks > 1:
            M = xyz_flat.shape[0]
            sigma, rgb, ambient_pos = jax.lax.map(
                lambda args: field_fn(*args),
                (
                    xyz_flat.reshape(field_chunks, M // field_chunks, 3),
                    dirs_flat.reshape(field_chunks, M // field_chunks, 3),
                ),
            )
            sigma = sigma.reshape(-1)
            rgb = rgb.reshape(-1, 3)
            ambient_pos = ambient_pos.reshape(-1, ambient_pos.shape[-1])
        else:
            sigma, rgb, ambient_pos = field_fn(xyz_flat, dirs_flat)
        sigma = (sigma * density_scale).reshape(N, S)
        rgb_t = rgb.T.reshape(3, N, S)  # channel-major for TPU tiling
        ambient_norm = jnp.sum(jnp.abs(ambient_pos), axis=-1).reshape(N, S)

    comp = composite_rays(
        sigma,
        rgb_t,
        march.dts,
        march.depth_ts,
        march.valid,
        ambients=ambient_norm,
        T_thresh=T_thresh,
    )
    image = comp["image"] + (1.0 - comp["weights_sum"])[:, None] * bg_color
    image = jnp.clip(image, 0.0, 1.0)
    span = jnp.maximum(fars - nears, 1e-6)
    depth = jnp.clip(comp["depth"] - nears, 0.0) / span
    # rays that miss the AABB carry float-max nears; zero them for stability
    hit = nears < 1e30
    depth = jnp.where(hit, depth, 0.0)
    return {
        "rgb_map": image,
        "depth_map": depth,
        "weights_sum": comp["weights_sum"],
        "ambient_sum": comp["ambient_sum"],
        "weights": comp["weights"],
        "n_samples": march.valid.sum(-1),
        "march_span": march_span,
    }


# ------------------------------------------------------------------ torso ----
class TorsoOccupancyState(NamedTuple):
    """2-D torso alpha grid [H*H] (row=y, col=x) + running mean
    (``radnerf_torso.py:200-241``)."""

    density_grid: jax.Array
    mean_density: jax.Array


def init_torso_occupancy(grid_size: int) -> TorsoOccupancyState:
    return TorsoOccupancyState(
        density_grid=jnp.zeros((grid_size * grid_size,), jnp.float32),
        mean_density=jnp.zeros((), jnp.float32),
    )


@partial(jax.jit, static_argnames=("alpha_fn", "grid_size"))
def update_torso_occupancy(
    alpha_fn: Callable[[jax.Array], jax.Array],  # (xy [M,2]) -> alpha [M]
    occ: TorsoOccupancyState,
    rng: jax.Array,
    *,
    grid_size: int,
    decay: float = 0.95,
) -> TorsoOccupancyState:
    """Full 2-D sweep at jittered cell centers → 5×5 max-pool dilation →
    decayed-max EMA (``radnerf_torso.py:200-241``). ``alpha_fn`` closes over
    params and a random pose / individual code."""
    H = grid_size
    half_cell = 1.0 / H
    r = jnp.arange(H, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(r, r, indexing="ij")  # coords (x, y)
    xy = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
    xy = (2.0 * xy / (H - 1) - 1.0) * (1.0 - half_cell)
    xy = xy + (jax.random.uniform(rng, xy.shape) * 2 - 1) * half_cell
    alphas = alpha_fn(xy)  # [H*H] in sweep order (x-major)
    # store transposed: tmp[y, x] = alpha(x, y)  (radnerf_torso.py:216)
    tmp = alphas.reshape(H, H).T  # [y, x]
    # 5x5 max-pool, stride 1, padding 2
    tmp = jax.lax.reduce_window(
        tmp[None],
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 5, 5),
        window_strides=(1, 1, 1),
        padding=((0, 0), (2, 2), (2, 2)),
    )[0]
    density = jnp.maximum(occ.density_grid * decay, tmp.reshape(-1))
    return TorsoOccupancyState(density, jnp.mean(density))


def torso_occupancy_mask(
    torso_occ: TorsoOccupancyState,
    bg_coords: jax.Array,  # [N, 2]
    grid_size: int,
    density_thresh_torso: float,
) -> jax.Array:
    """[N] bool torso-occupancy mask at screen coords — the per-video
    constant infer drivers precompute for :func:`render_rays_radnerf_torso`
    (``radnerf_torso.py:161-177`` semantics)."""
    from geneface_tpu.models.radnerf.radnerf_torso import sample_torso_occupancy

    thresh = jnp.minimum(density_thresh_torso, torso_occ.mean_density)
    occupancy = sample_torso_occupancy(
        torso_occ.density_grid, bg_coords, grid_size
    )
    return occupancy > thresh


def render_rays_radnerf_torso(
    field_fn: Callable,  # head field (xyz, dirs) -> (sigma, rgb, ambient)
    torso_fn: Callable,  # (xy [N,2], head_img, head_ws) -> (alpha, color, dx)
    rays_o: jax.Array,
    rays_d: jax.Array,
    bg_coords: jax.Array,  # [N, 2] screen coords in [-1, 1]
    occ: OccupancyState,
    torso_occ: TorsoOccupancyState,
    *,
    bound: float,
    min_near: float,
    dt_gamma: float,
    max_steps: int,
    grid_size: int,
    density_thresh_torso: float,
    bg_color: jax.Array | float = 1.0,
    rng: jax.Array | None = None,
    T_thresh: float = 1e-4,
    aabb: jax.Array | None = None,
    mean_samples_per_ray: float | None = None,
    ray_capacity: int | None = None,
    lattice_K: int | None = None,
    march_paired: bool = False,
    cull_kdop: tuple[jax.Array, jax.Array] | None = None,
    density_scale: float = 1.0,
    torso_mask: jax.Array | None = None,
) -> dict:
    """Head (frozen, stop-gradient) + torso composite
    (``radnerf_torso.py:86-199``): torso mixes with the background, then the
    head image composites over the torso background.

    ``torso_mask`` ([N] float/bool): precomputed occupancy mask. The
    bilinear sample of the 2-D torso grid at every pixel costs ~11 ms at
    512² when the grid is a traced argument (262k × 4 element gathers);
    both the grid and the screen coords are per-VIDEO constants, so infer
    drivers compute the mask once outside the frame jit and pass it here.
    ``None`` falls back to sampling in-graph (GUI paths with changing
    resolutions).
    """
    from geneface_tpu.models.radnerf.radnerf_torso import sample_torso_occupancy

    head = render_rays_radnerf(
        field_fn,
        rays_o,
        rays_d,
        occ,
        bound=bound,
        min_near=min_near,
        dt_gamma=dt_gamma,
        max_steps=max_steps,
        grid_size=grid_size,
        bg_color=0.0,  # compose manually below
        rng=rng,
        T_thresh=T_thresh,
        aabb=aabb,
        mean_samples_per_ray=mean_samples_per_ray,
        ray_capacity=ray_capacity,
        lattice_K=lattice_K,
        march_paired=march_paired,
        cull_kdop=cull_kdop,
        density_scale=density_scale,
    )
    head = jax.tree_util.tree_map(jax.lax.stop_gradient, head)

    if torso_mask is None:
        thresh = jnp.minimum(density_thresh_torso, torso_occ.mean_density)
        occupancy = sample_torso_occupancy(
            torso_occ.density_grid, bg_coords, grid_size
        )
        mask = (occupancy > thresh).astype(jnp.float32)[:, None]
    else:
        mask = torso_mask.astype(jnp.float32).reshape(-1, 1)

    alpha, color, deform = torso_fn(
        bg_coords, head["rgb_map"], head["weights_sum"][:, None]
    )
    torso_alpha = alpha * mask
    torso_color = color * mask
    torso_bg = torso_color * torso_alpha + bg_color * (1.0 - torso_alpha)

    head_raw = head["rgb_map"]  # head composite with bg 0
    ws = head["weights_sum"][:, None]
    image = jnp.clip(head_raw + (1.0 - ws) * torso_bg, 0.0, 1.0)
    return {
        "rgb_map": image,
        "depth_map": head["depth_map"],
        "weights_sum": head["weights_sum"],
        "torso_alpha_map": torso_alpha,
        "torso_rgb_map": torso_bg,
        "deform": deform,
    }
