"""Differentiable 3DMM face renderer for photometric head-pose tracking.

TPU-native replacement for the reference's pytorch3d mesh rasterizer
(``data_util/face_tracking/render_3dmm.py:80-195``): the tracker only needs a
*differentiable* photometric term — gradients of rendered color w.r.t.
vertex positions / albedo / lighting — not a production rasterizer. The
idiomatic JAX shape for that is a **soft vertex splat**: every vertex
scatter-adds its shaded color into the (downsampled) render target with
bilinear footprint weights and a soft depth weighting (softmax over depth
per pixel via a numerator/denominator accumulation). Static shapes, one
scatter per frame batch, fully differentiable — no per-pixel triangle
search, no dynamic rasterization state.

The shading model matches the reference exactly where it matters:

- per-vertex normals: triangle cross products scatter-summed to vertices
  (``render_3dmm.py compute_normal``);
- 9-band spherical-harmonics illumination with the reference's +0.8 ambient
  bias on the DC coefficient (``render_3dmm.py Illumination_layer``;
  the SH constants are the standard irradiance basis);
- colors = albedo * SH irradiance, rendered with a black background and a
  coverage mask, compared in L2 over masked pixels
  (``face_tracker.py:258-263`` cal_col_loss).

The BFM front model is an open face shell (no back of head), so the soft
depth weighting resolves the only real occlusions (nose over cheek etc.).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "FullFaceBasis",
    "full_basis_from_bfm",
    "vertex_normals",
    "sh9_irradiance",
    "render_vertices_soft",
    "photometric_loss",
]


class FullFaceBasis(NamedTuple):
    """Vertex-level 3DMM: geometry + per-vertex albedo + topology.

    geo = mean + id_base @ id + exp_base @ exp, reshaped [V, 3];
    albedo = tex_mean + tex_base @ tex, reshaped [V, 3] in [0, 1].
    ``lm_index`` maps the 68 landmarks to vertex ids. ``tris`` may be empty
    ([0, 3]) — normals then default to +z (albedo-only shading).
    """

    mean: jnp.ndarray  # [V*3]
    id_base: jnp.ndarray  # [V*3, id_dim]
    exp_base: jnp.ndarray  # [V*3, exp_dim]
    tex_mean: jnp.ndarray  # [V*3]
    tex_base: jnp.ndarray  # [V*3, tex_dim]
    tris: jnp.ndarray  # [F, 3] int32
    lm_index: jnp.ndarray  # [68] int32


def full_basis_from_bfm(mat_path: str) -> FullFaceBasis:
    """Load a vertex-level basis from BFM09 ``BFM_model_front.mat`` (the
    file the reference's ``face3d_helper.py``/``facemodel.py`` read; not
    shipped here). Albedo is normalized to [0, 1]."""
    from scipy.io import loadmat

    m = loadmat(mat_path)
    kp = (m["keypoints"].reshape(-1) - 1).astype(np.int32)
    tris = (np.asarray(m["tri"], np.int64) - 1).astype(np.int32)
    return FullFaceBasis(
        mean=jnp.asarray(m["meanshape"].reshape(-1), jnp.float32),
        id_base=jnp.asarray(m["idBase"], jnp.float32),
        exp_base=jnp.asarray(m["exBase"], jnp.float32),
        tex_mean=jnp.asarray(m["meantex"].reshape(-1) / 255.0, jnp.float32),
        tex_base=jnp.asarray(m["texBase"] / 255.0, jnp.float32),
        tris=jnp.asarray(tris, jnp.int32),
        lm_index=jnp.asarray(kp, jnp.int32),
    )


def vertex_normals(geo: jnp.ndarray, tris: jnp.ndarray) -> jnp.ndarray:
    """[B, V, 3] world-space vertices + [F, 3] triangles → unit vertex
    normals [B, V, 3] (area-weighted triangle-normal scatter, the same
    construction as ``render_3dmm.py compute_normal``)."""
    if tris.shape[0] == 0:
        n = jnp.zeros_like(geo)
        return n.at[..., 2].set(1.0)

    def unit(x):
        # rsqrt(|x|^2 + eps): finite gradient at x=0, unlike norm(x)+eps
        # (degenerate triangles / cancelling vertex normals nan out autodiff)
        return x * jax.lax.rsqrt(jnp.sum(x * x, -1, keepdims=True) + 1e-12)

    v1 = geo[:, tris[:, 0], :]
    v2 = geo[:, tris[:, 1], :]
    v3 = geo[:, tris[:, 2], :]
    fn = unit(jnp.cross(v2 - v1, v3 - v1))  # [B, F, 3]
    V = geo.shape[1]
    idx = tris.reshape(-1)  # [3F]
    fn3 = jnp.repeat(fn, 3, axis=1)  # [B, 3F, 3] (tri normal per corner)
    vn = jnp.zeros((geo.shape[0], V, 3), geo.dtype).at[:, idx, :].add(fn3)
    return unit(vn)


# standard real-SH irradiance constants (Ramamoorthi & Hanrahan), as used by
# the reference Illumination_layer (render_3dmm.py:146-179)
_A = (math.pi, 2.0 * math.pi / math.sqrt(3.0), 2.0 * math.pi / math.sqrt(8.0))
_C = (
    1.0 / math.sqrt(4.0 * math.pi),
    math.sqrt(3.0) / math.sqrt(4.0 * math.pi),
    3.0 * math.sqrt(5.0) / math.sqrt(12.0 * math.pi),
)
_D0 = 0.5 / math.sqrt(3.0)


def sh9_irradiance(normals: jnp.ndarray, gamma: jnp.ndarray) -> jnp.ndarray:
    """[B, V, 3] unit normals + [B, 27] SH coefficients → [B, V, 3] RGB
    irradiance. ``gamma`` is 3 channels x 9 bands; the DC band carries the
    reference's +0.8 ambient bias (``render_3dmm.py:150``)."""
    B, V, _ = normals.shape
    g = gamma.reshape(B, 3, 9)
    g = g.at[:, :, 0].add(0.8)
    nx, ny, nz = normals[..., 0], normals[..., 1], normals[..., 2]
    Y = jnp.stack(
        [
            jnp.full_like(nx, _A[0] * _C[0]),
            -_A[1] * _C[1] * ny,
            _A[1] * _C[1] * nz,
            -_A[1] * _C[1] * nx,
            _A[2] * _C[2] * nx * ny,
            -_A[2] * _C[2] * ny * nz,
            _A[2] * _C[2] * _D0 * (3.0 * nz**2 - 1.0),
            -_A[2] * _C[2] * nx * nz,
            _A[2] * _C[2] * 0.5 * (nx**2 - ny**2),
        ],
        axis=-1,
    )  # [B, V, 9]
    return jnp.einsum("bvk,bck->bvc", Y, g)


def render_vertices_soft(
    cam_geo: jnp.ndarray,  # [B, V, 3] camera-space vertices (+z forward)
    colors: jnp.ndarray,  # [B, V, 3] shaded vertex colors
    focal,
    cxy,  # [2] principal point (full-res pixels)
    H: int,
    W: int,
    *,
    scale: int = 4,  # render at (H/scale, W/scale)
    z_tau: float = 0.05,  # soft depth-test temperature (camera units)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Soft vertex-splat render → (rgb [B, h, w, 3], weight [B, h, w]).

    Each vertex splats its color into its 4 bilinear-neighbor pixels of the
    downsampled target, weighted by ``exp(-(z - z_ref)/z_tau)`` — a softmax
    depth test once the numerator is divided by the accumulated weight.
    Pixels with ~zero accumulated weight are background (mask them with
    ``weight > thresh``).
    """
    B, V, _ = cam_geo.shape
    h, w = H // scale, W // scale
    x, y, z = cam_geo[..., 0], cam_geo[..., 1], cam_geo[..., 2]
    zc = jnp.maximum(z, 1e-5)
    u = (focal * x / zc + cxy[0]) / scale  # [B, V] column
    v = (focal * y / zc + cxy[1]) / scale  # row
    z_ref = jax.lax.stop_gradient(jnp.min(zc, axis=1, keepdims=True))
    zw = jnp.exp(-(zc - z_ref) / z_tau)  # [B, V]

    u0 = jnp.floor(u - 0.5)
    v0 = jnp.floor(v - 0.5)
    fu = u - 0.5 - u0
    fv = v - 0.5 - v0
    iu0 = u0.astype(jnp.int32)
    iv0 = v0.astype(jnp.int32)

    rgbw = jnp.concatenate(
        [colors * zw[..., None], zw[..., None]], axis=-1
    )  # [B, V, 4]
    num = jnp.zeros((B, h * w, 4), cam_geo.dtype)
    for du, dv, wgt in (
        (0, 0, (1 - fu) * (1 - fv)),
        (1, 0, fu * (1 - fv)),
        (0, 1, (1 - fu) * fv),
        (1, 1, fu * fv),
    ):
        cu = iu0 + du
        cv = iv0 + dv
        ok = (cu >= 0) & (cu < w) & (cv >= 0) & (cv < h)
        pix = jnp.where(ok, cv * w + cu, h * w)  # OOB rows dropped
        num = num.at[
            jnp.arange(B)[:, None], pix, :
        ].add(jnp.where(ok[..., None], wgt[..., None] * rgbw, 0.0), mode="drop")
    weight = num[..., 3]
    rgb = num[..., :3] / jnp.maximum(weight[..., None], 1e-8)
    return rgb.reshape(B, h, w, 3), weight.reshape(B, h, w)


def photometric_loss(
    rgb: jnp.ndarray,  # [B, h, w, 3] rendered
    weight: jnp.ndarray,  # [B, h, w] splat coverage
    target: jnp.ndarray,  # [B, h, w, 3] downsampled real frames
    mask_thresh: float = 0.05,
) -> jnp.ndarray:
    """Masked L2 color loss (``face_tracker.py cal_col_loss`` semantics:
    compare only where the render covers the image)."""
    mask = jax.lax.stop_gradient(weight > mask_thresh).astype(rgb.dtype)
    diff = jnp.sum((rgb - target) ** 2, axis=-1) * mask
    return jnp.sum(diff) / jnp.maximum(jnp.sum(mask), 1.0)


def downsample_frames(frames: np.ndarray, scale: int) -> np.ndarray:
    """[B, H, W, 3] → [B, H/scale, W/scale, 3] box average (host numpy)."""
    B, H, W, C = frames.shape
    h, w = H // scale, W // scale
    return (
        frames[:, : h * scale, : w * scale]
        .reshape(B, h, scale, w, scale, C)
        .mean(axis=(2, 4))
    )
