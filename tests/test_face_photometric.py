"""Photometric face tracking: the differentiable-render term must recover
pose information that NOISY landmarks lose.

Breaks the circularity of the landmark-only recovery test
(``test_face_tracker.py``): here the fit sees landmarks corrupted with
realistic detector noise (sigma = 2 px), and only the rendered frames carry
the exact pose signal — the regime the reference's photometric stages exist
for (``data_util/face_tracking/face_tracker.py:225-385``,
``render_3dmm.py``).
"""

import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from geneface_tpu.datagen.face_renderer import (  # noqa: E402
    FullFaceBasis,
    downsample_frames,
    photometric_loss,
    render_vertices_soft,
    sh9_irradiance,
    vertex_normals,
)
from geneface_tpu.datagen.face_tracker import (  # noqa: E402
    FaceBasis,
    _cam_geometry,
    fit_sequence,
    refine_photometric,
)


def synth_full_basis(rng, nu=40, nv=40, id_dim=6, exp_dim=4, tex_dim=3):
    """Deformable sphere-cap 'face shell' with grid triangulation and a
    spatially-varying albedo (photometric alignment must be informative)."""
    r = 0.8
    th = np.linspace(-0.6, 0.6, nu)
    ph = np.linspace(-0.7, 0.7, nv)
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    x = r * np.sin(tt)
    y = r * np.sin(pp) * 1.15
    z = -r * np.cos(tt) * np.cos(pp)
    mean = np.stack([x, y, z], -1).reshape(-1, 3)  # [V, 3]
    V = mean.shape[0]

    tris = []
    for i in range(nu - 1):
        for j in range(nv - 1):
            a, b = i * nv + j, i * nv + j + 1
            c, d = (i + 1) * nv + j, (i + 1) * nv + j + 1
            tris += [(a, b, c), (b, d, c)]
    tris = np.asarray(tris, np.int32)

    albedo = np.stack(
        [
            0.55 + 0.35 * np.sin(4.0 * x) * np.cos(3.0 * y),
            0.45 + 0.30 * np.cos(5.0 * x + 1.0),
            0.40 + 0.30 * np.sin(3.0 * y + 0.5),
        ],
        -1,
    ).reshape(-1, 3)

    lm_index = np.linspace(0, V - 1, 68).astype(np.int32)
    return FullFaceBasis(
        mean=jnp.asarray(mean.reshape(-1), jnp.float32),
        id_base=jnp.asarray(rng.randn(V * 3, id_dim) * 0.01, jnp.float32),
        exp_base=jnp.asarray(rng.randn(V * 3, exp_dim) * 0.01, jnp.float32),
        tex_mean=jnp.asarray(albedo.reshape(-1), jnp.float32),
        tex_base=jnp.asarray(rng.randn(V * 3, tex_dim) * 0.01, jnp.float32),
        tris=jnp.asarray(tris),
        lm_index=jnp.asarray(lm_index),
    )


def lm_basis_of(fb: FullFaceBasis) -> FaceBasis:
    """Landmark restriction of the full basis (what fit_sequence consumes)."""
    sel = np.stack(
        [3 * np.asarray(fb.lm_index) + k for k in range(3)], -1
    ).reshape(-1)
    return FaceBasis(
        mean=fb.mean[sel], id_base=fb.id_base[sel], exp_base=fb.exp_base[sel]
    )


def render_gt(fb, idp, exp, euler, trans, light, focal, cxy, H, W, scale=2):
    """GT frames rendered at the photometric stage's render scale, then
    nearest-upsampled to full resolution — vertex density stays above pixel
    density, as the real BFM (35k vertices) guarantees on real video."""
    cam = _cam_geometry(fb, idp, exp, euler, trans)
    albedo = fb.tex_mean.reshape(1, -1, 3)
    colors = albedo * sh9_irradiance(vertex_normals(cam, fb.tris), light)
    rgb, wmap = render_vertices_soft(
        cam, colors, focal, cxy, H, W, scale=scale, z_tau=0.05
    )
    up = np.kron(
        np.asarray(rgb), np.ones((1, scale, scale, 1), np.float32)
    )
    return up, np.asarray(wmap)


def test_photometric_refine_beats_noisy_landmarks():
    rng = np.random.RandomState(3)
    fb = synth_full_basis(rng)
    lm_b = lm_basis_of(fb)
    T, H, W = 6, 128, 128
    focal_true = 275.0
    cxy = jnp.asarray([W / 2.0, H / 2.0], jnp.float32)

    # smooth head-motion trajectories (real video; the temporal-laplacian
    # term assumes smoothness)
    t_ax = np.arange(T)
    euler_gt = jnp.asarray(
        np.stack(
            [
                0.12 * np.sin(t_ax * 0.8),
                0.10 * np.cos(t_ax * 0.7),
                0.05 * np.sin(t_ax * 0.5),
            ],
            -1,
        ),
        jnp.float32,
    )
    trans_gt = jnp.asarray(
        np.stack(
            [
                0.06 * np.sin(t_ax * 0.6),
                0.05 * np.cos(t_ax * 0.9),
                7.0 + 0.15 * np.sin(t_ax * 0.4),
            ],
            -1,
        ),
        jnp.float32,
    )
    exp_gt = jnp.asarray(rng.randn(T, 4) * 0.2, jnp.float32)
    id_gt = jnp.asarray(rng.randn(6) * 0.2, jnp.float32)
    light_gt = jnp.zeros((T, 27), jnp.float32).at[:, 2].set(0.3)

    frames, wmap = render_gt(
        fb, id_gt, exp_gt, euler_gt, trans_gt, light_gt,
        jnp.float32(focal_true), cxy, H, W,
    )
    assert wmap.max() > 0.5  # face actually on screen

    cam = _cam_geometry(fb, id_gt, exp_gt, euler_gt, trans_gt)
    lm_cam = np.asarray(cam[:, fb.lm_index, :])
    lms_clean = np.stack(
        [
            focal_true * lm_cam[..., 0] / lm_cam[..., 2] + W / 2.0,
            focal_true * lm_cam[..., 1] / lm_cam[..., 2] + H / 2.0,
        ],
        -1,
    )
    # realistic detector noise
    lms_noisy = lms_clean + rng.randn(*lms_clean.shape) * 2.0

    track = fit_sequence(
        lms_noisy, lm_b, H, W,
        focal_candidates=(225, 275, 325),
        coarse_steps=200, refine_steps=500, coarse_every=1,
    )
    e0 = np.abs(np.asarray(track["euler"]) - np.asarray(euler_gt)).mean()
    t0 = np.abs(np.asarray(track["trans"]) - np.asarray(trans_gt)).mean()

    def clean_reproj(r):
        cam = _cam_geometry(
            fb, jnp.asarray(r["id"]), jnp.asarray(r["exp"]),
            jnp.asarray(r["euler"]), jnp.asarray(r["trans"]),
        )
        lc = np.asarray(cam[:, fb.lm_index, :])
        pred = np.stack(
            [
                focal_true * lc[..., 0] / lc[..., 2] + W / 2.0,
                focal_true * lc[..., 1] / lc[..., 2] + H / 2.0,
            ],
            -1,
        )
        return np.abs(pred - lms_clean).mean()

    r0 = clean_reproj(track)

    refined = refine_photometric(
        track, fb, frames, lms_noisy, H, W,
        scale=2, global_steps=300, frame_steps=80, photo_batch=T,
        lambda_lan=3e-3,
    )
    e1 = np.abs(refined["euler"] - np.asarray(euler_gt)).mean()
    t1 = np.abs(refined["trans"] - np.asarray(trans_gt)).mean()
    r1 = clean_reproj(refined)

    # the photometric term must tighten pose beyond what noisy landmarks
    # give (the remaining euler/trans error is the rotation-translation
    # gauge this camera geometry leaves sub-pixel — as for the reference)
    assert e1 < 0.9 * e0, f"euler err {e1:.4f} !< 0.9x landmark-only {e0:.4f}"
    assert t1 < 0.6 * t0, f"trans err {t1:.4f} !< 0.6x landmark-only {t0:.4f}"
    assert e1 < 0.035, f"refined euler err {e1:.4f} rad"
    # alignment vs the NOISE-FREE landmarks: refinement must not trade
    # image fit for reprojection accuracy
    assert r1 < r0 + 0.1, f"clean reprojection {r1:.3f}px vs {r0:.3f}px"


def test_renderer_gradients_flow():
    """d(photometric loss)/d(translation) is finite and nonzero — the
    property the whole stage rests on."""
    import jax

    rng = np.random.RandomState(0)
    fb = synth_full_basis(rng, nu=8, nv=8)
    T, H, W = 2, 64, 64
    cxy = jnp.asarray([32.0, 32.0], jnp.float32)
    focal = jnp.float32(140.0)
    idp = jnp.zeros((6,))
    exp = jnp.zeros((T, 4))
    euler = jnp.zeros((T, 3))
    trans = jnp.asarray([[0.0, 0.0, 7.0]] * T, jnp.float32)
    light = jnp.zeros((T, 27))

    target, _ = render_gt(fb, idp, exp, euler, trans, light, focal, cxy, H, W)
    target = jnp.asarray(downsample_frames(target, 2))

    def loss(tr):
        cam = _cam_geometry(fb, idp, exp, euler, tr)
        colors = fb.tex_mean.reshape(1, -1, 3) * sh9_irradiance(
            vertex_normals(cam, fb.tris), light
        )
        rgb, wmap = render_vertices_soft(
            cam, colors, focal, cxy, H, W, scale=2
        )
        return photometric_loss(rgb, wmap, target)

    shifted = trans + jnp.asarray([[0.02, -0.01, 0.05]] * T)
    g = jax.grad(loss)(shifted)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 1e-6
    # gradient descent from the shifted pose reduces the loss (some step
    # size along -g descends; fixed steps can overshoot the narrow basin)
    l0 = float(loss(shifted))
    gn = g / (jnp.abs(g).max() + 1e-9)
    l1 = min(float(loss(shifted - s * gn)) for s in (0.002, 0.01, 0.05))
    assert l1 < l0
