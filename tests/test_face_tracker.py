"""3DMM face tracker: recover known pose/focal from synthetic landmarks."""

import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from geneface_tpu.datagen.face_tracker import (  # noqa: E402
    FaceBasis,
    fit_sequence,
    project_landmarks,
)


def synth_basis(rng, id_dim=8, exp_dim=6):
    # a face-sized blob of 68 keypoints with small linear deformations
    mean = rng.randn(68, 3) * np.array([0.8, 1.0, 0.35]) * 0.5
    mean[:, 2] -= 0.1
    return FaceBasis(
        mean=jnp.asarray(mean.reshape(-1), jnp.float32),
        id_base=jnp.asarray(rng.randn(68 * 3, id_dim) * 0.02, jnp.float32),
        exp_base=jnp.asarray(rng.randn(68 * 3, exp_dim) * 0.02, jnp.float32),
    )


def test_tracker_recovers_pose_and_focal():
    rng = np.random.RandomState(0)
    basis = synth_basis(rng)
    T = 12
    H = W = 512
    true_focal = 1100.0
    euler = jnp.asarray(rng.uniform(-0.15, 0.15, (T, 3)), jnp.float32)
    trans = jnp.asarray(
        np.stack(
            [
                rng.uniform(-0.1, 0.1, T),
                rng.uniform(-0.1, 0.1, T),
                rng.uniform(6.5, 7.5, T),
            ],
            -1,
        ),
        jnp.float32,
    )
    exp = jnp.asarray(rng.randn(T, 6) * 0.3, jnp.float32)
    idp = jnp.asarray(rng.randn(8) * 0.3, jnp.float32)

    lms = project_landmarks(
        basis, idp, exp, euler, trans, jnp.float32(true_focal),
        jnp.asarray([W / 2, H / 2], jnp.float32),
    )
    lms_np = np.asarray(lms)
    assert lms_np.min() > 0 and lms_np.max() < 512  # stays on screen

    out = fit_sequence(
        lms_np, basis, H, W,
        focal_candidates=(700, 900, 1100, 1300),
        coarse_steps=300, refine_steps=800, coarse_every=4,
    )
    assert out["focal"] == 1100.0
    # reprojection error under a pixel
    pred = project_landmarks(
        basis,
        jnp.asarray(out["id"]),
        jnp.asarray(out["exp"]),
        jnp.asarray(out["euler"]),
        jnp.asarray(out["trans"]),
        jnp.float32(out["focal"]),
        jnp.asarray([W / 2, H / 2], jnp.float32),
    )
    err = np.abs(np.asarray(pred) - lms_np).mean()
    assert err < 1.0, f"mean reprojection error {err:.3f}px"
    # recovered HEAD POSE close to truth (the quantity the NeRF stages
    # consume): euler to ~1 degree, translation to scene scale
    eerr = np.abs(np.asarray(out["euler"]) - np.asarray(euler)).mean()
    assert eerr < 0.02, f"mean euler error {eerr:.4f} rad"
    assert np.abs(out["trans"][:, 2] - np.asarray(trans)[:, 2]).mean() < 0.3
    terr_xy = np.abs(out["trans"][:, :2] - np.asarray(trans)[:, :2]).mean()
    assert terr_xy < 0.1, f"mean xy translation error {terr_xy:.4f}"
