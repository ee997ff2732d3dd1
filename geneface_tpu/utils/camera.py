"""Camera math: rays, pose conversions, euler angles, bg coords.

Re-implementations of ``modules/radnerfs/utils.py`` camera helpers:
``nerf_matrix_to_ngp:53-60`` (axis permute + scale/offset into the ngp unit
box), ``convert_poses:262-269`` (4×4 c2w → 6-D euler+translation),
``get_bg_coords:272-278``, ``get_rays:281-363`` (pinhole rays with
random-index / rect / patch / full sampling modes), and the XYZ-convention
euler↔matrix pair (a pytorch3d formula, re-derived here in closed form).
Host-side numpy: ray *index* generation is data-pipeline work; only the
gathered ray batches go to device.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "nerf_matrix_to_ngp",
    "euler_to_matrix",
    "matrix_to_euler",
    "convert_poses",
    "euler_trans_to_c2w",
    "c2w_to_euler_trans",
    "get_bg_coords",
    "get_rays",
]


def nerf_matrix_to_ngp(pose: np.ndarray, scale: float = 4.0, offset=(0, 0, 0)) -> np.ndarray:
    """OpenGL-style nerf pose → instant-ngp convention: rows permuted
    (y,z,x), columns 1..2 negated, translation scaled+offset."""
    p = np.asarray(pose, np.float32)
    out = np.array(
        [
            [p[1, 0], -p[1, 1], -p[1, 2], p[1, 3] * scale + offset[0]],
            [p[2, 0], -p[2, 1], -p[2, 2], p[2, 3] * scale + offset[1]],
            [p[0, 0], -p[0, 1], -p[0, 2], p[0, 3] * scale + offset[2]],
            [0, 0, 0, 1],
        ],
        dtype=np.float32,
    )
    return out


def euler_to_matrix(euler: np.ndarray) -> np.ndarray:
    """Intrinsic-XYZ euler [..., 3] → rotation matrices [..., 3, 3]
    (``R = Rx(a) @ Ry(b) @ Rz(c)``)."""
    e = np.asarray(euler, np.float32)
    a, b, c = e[..., 0], e[..., 1], e[..., 2]
    ca, sa = np.cos(a), np.sin(a)
    cb, sb = np.cos(b), np.sin(b)
    cc, sc = np.cos(c), np.sin(c)
    m = np.empty(e.shape[:-1] + (3, 3), np.float32)
    m[..., 0, 0] = cb * cc
    m[..., 0, 1] = -cb * sc
    m[..., 0, 2] = sb
    m[..., 1, 0] = sa * sb * cc + ca * sc
    m[..., 1, 1] = -sa * sb * sc + ca * cc
    m[..., 1, 2] = -sa * cb
    m[..., 2, 0] = -ca * sb * cc + sa * sc
    m[..., 2, 1] = ca * sb * sc + sa * cc
    m[..., 2, 2] = ca * cb
    return m


def matrix_to_euler(matrix: np.ndarray) -> np.ndarray:
    """Rotation matrices [..., 3, 3] → intrinsic-XYZ euler [..., 3]."""
    m = np.asarray(matrix, np.float32)
    b = np.arcsin(np.clip(m[..., 0, 2], -1.0, 1.0))
    a = np.arctan2(-m[..., 1, 2], m[..., 2, 2])
    c = np.arctan2(-m[..., 0, 1], m[..., 0, 0])
    return np.stack([a, b, c], axis=-1)


def convert_poses(poses: np.ndarray) -> np.ndarray:
    """[B, 4, 4] c2w → [B, 6] (3 euler-XYZ, 3 translation)."""
    p = np.asarray(poses, np.float32)
    return np.concatenate([matrix_to_euler(p[:, :3, :3]), p[:, :3, 3]], axis=-1)


def euler_trans_to_c2w(euler: np.ndarray, trans: np.ndarray) -> np.ndarray:
    """Inverse of convert_poses: euler [B,3] + trans [B,3] → c2w [B,4,4]."""
    B = euler.shape[0]
    out = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    out[:, :3, :3] = euler_to_matrix(euler)
    out[:, :3, 3] = trans
    return out


def c2w_to_euler_trans(c2w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    c2w = np.asarray(c2w, np.float32)
    return matrix_to_euler(c2w[:, :3, :3]), c2w[:, :3, 3]


def get_bg_coords(H: int, W: int) -> np.ndarray:
    """[1, H*W, 2] normalized pixel coords in [-1, 1]
    (``utils.py:272-278``; x varies over rows)."""
    X = np.arange(H, dtype=np.float32) / (H - 1) * 2 - 1
    Y = np.arange(W, dtype=np.float32) / (W - 1) * 2 - 1
    xs, ys = np.meshgrid(X, Y, indexing="ij")
    return np.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)[None]


def get_rays(
    pose: np.ndarray,  # [4, 4] c2w
    intrinsics,  # (fx, fy, cx, cy)
    H: int,
    W: int,
    n_rays: int = -1,
    rect=None,  # (xmin, xmax, ymin, ymax) row-major as the reference
    patch_size: int = 1,
    rng: np.random.RandomState | None = None,
) -> dict:
    """Pinhole ray generation with the reference's sampling modes
    (``utils.py:281-363``): full frame (``n_rays<0``), uniform random indices,
    rect-restricted, or GRAF-style square patches. Returns dict with
    ``rays_o/rays_d [N,3]``, pixel indices ``inds [N]`` and ``i/j`` coords.
    """
    rng = rng or np.random
    fx, fy, cx, cy = [float(v) for v in intrinsics]
    pose = np.asarray(pose, np.float32)

    if n_rays > 0:
        n_rays = min(n_rays, H * W)
        if patch_size > 1:
            num_patch = n_rays // patch_size**2
            x0 = rng.randint(0, H - patch_size, num_patch)
            y0 = rng.randint(0, W - patch_size, num_patch)
            pi, pj = np.meshgrid(
                np.arange(patch_size), np.arange(patch_size), indexing="ij"
            )
            xs = (x0[:, None] + pi.reshape(-1)[None]).reshape(-1)
            ys = (y0[:, None] + pj.reshape(-1)[None]).reshape(-1)
            inds = xs * W + ys
        elif rect is not None:
            xmin, xmax, ymin, ymax = rect
            gx, gy = np.meshgrid(
                np.arange(xmin, xmax), np.arange(ymin, ymax), indexing="ij"
            )
            inds = (gx * W + gy).reshape(-1)
        else:
            inds = rng.randint(0, H * W, n_rays)
    else:
        inds = np.arange(H * W)

    # pixel centers; i = column + .5, j = row + .5 (reference transposes its
    # meshgrid so i indexes width)
    i = (inds % W).astype(np.float32) + 0.5
    j = (inds // W).astype(np.float32) + 0.5

    zs = np.ones_like(i)
    xs = (i - cx) / fx
    ys = (j - cy) / fy
    dirs = np.stack([xs, ys, zs], axis=-1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_d = dirs @ pose[:3, :3].T
    rays_o = np.broadcast_to(pose[:3, 3], rays_d.shape).copy()
    return {"rays_o": rays_o, "rays_d": rays_d, "inds": inds, "i": i, "j": j}


def get_rays_device(pose, intrinsics, inds, H, W):
    """jnp variant of :func:`get_rays` for on-device ray generation.

    pose [4,4] (traced), intrinsics (fx,fy,cx,cy floats), inds [N] int32
    pixel indices → (rays_o [N,3], rays_d [N,3], i [N], j [N]). Moving ray
    generation into the jitted step shrinks the per-step host→device payload
    from ~3.5 MB (rays + pixels fp32) to ~1 MB (indices + uint8 pixels).
    """
    import jax.numpy as jnp

    fx, fy, cx, cy = [float(v) for v in intrinsics]
    i = (inds % W).astype(jnp.float32) + 0.5
    j = (inds // W).astype(jnp.float32) + 0.5
    zs = jnp.ones_like(i)
    xs = (i - cx) / fx
    ys = (j - cy) / fy
    dirs = jnp.stack([xs, ys, zs], axis=-1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rays_d = dirs @ pose[:3, :3].T
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return rays_o, rays_d, i, j


def bg_coords_device(inds, H, W):
    """jnp bg coords in [-1,1] for pixel indices (see :func:`get_bg_coords`:
    x varies over rows)."""
    import jax.numpy as jnp

    xs = (inds // W).astype(jnp.float32) / (H - 1) * 2 - 1
    ys = (inds % W).astype(jnp.float32) / (W - 1) * 2 - 1
    return jnp.stack([xs, ys], axis=-1)
