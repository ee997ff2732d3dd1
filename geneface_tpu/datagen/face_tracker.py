"""3DMM head-pose tracker: fit (id, exp, euler, trans, focal) to 2-D landmarks.

TPU-native re-design of ``data_util/face_tracking/face_tracker.py``: the
reference grid-searches focal 600→1700 then runs thousands of per-window
torch-Adam steps (``face_tracker.py:59-126,135-180``). Here the whole
sequence is optimized **jointly in one jitted optax loop** — all frames
vectorized on the batch axis, the focal grid search `vmap`-ed over candidate
focals — which is both the idiomatic JAX shape and dramatically faster than
the reference's sequential windows.

The morphable basis is abstracted as :class:`FaceBasis` (keypoint mean +
linear id/exp bases, i.e. the 3DMM restricted to the 68 landmarks — exactly
what the landmark loss needs); load one from a BFM file via
``basis_from_bfm`` when available, or supply any compatible basis.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = [
    "FaceBasis",
    "basis_from_bfm",
    "project_landmarks",
    "fit_sequence",
    "refine_photometric",
]


class FaceBasis(NamedTuple):
    """Landmark-restricted 3DMM: lm3d = mean + id_base @ id + exp_base @ exp."""

    mean: jnp.ndarray  # [68*3]
    id_base: jnp.ndarray  # [68*3, id_dim]
    exp_base: jnp.ndarray  # [68*3, exp_dim]


def basis_from_bfm(mat_path: str, keys_path: str | None = None) -> FaceBasis:
    """Build a landmark basis from a BFM09 ``BFM_model_front.mat`` (the file
    the reference's ``face3d_helper.py:84-99`` loads; not shipped here)."""
    from scipy.io import loadmat

    m = loadmat(mat_path)
    kp = (m["keypoints"].reshape(-1) - 1).astype(np.int64)  # 1-based -> 0
    sel = np.stack([3 * kp, 3 * kp + 1, 3 * kp + 2], -1).reshape(-1)
    return FaceBasis(
        mean=jnp.asarray(m["meanshape"].reshape(-1)[sel]),
        id_base=jnp.asarray(m["idBase"][sel]),
        exp_base=jnp.asarray(m["exBase"][sel]),
    )


def _euler_to_rot(euler: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] (pitch, yaw, roll) → [..., 3, 3] rotation (XYZ convention,
    matching ``data_util/face_tracking/geo_transform.py``)."""
    x, y, z = euler[..., 0], euler[..., 1], euler[..., 2]
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    rx = jnp.stack(
        [one, zero, zero, zero, cx, -sx, zero, sx, cx], -1
    ).reshape(*x.shape, 3, 3)
    ry = jnp.stack(
        [cy, zero, sy, zero, one, zero, -sy, zero, cy], -1
    ).reshape(*x.shape, 3, 3)
    rz = jnp.stack(
        [cz, -sz, zero, sz, cz, zero, zero, zero, one], -1
    ).reshape(*x.shape, 3, 3)
    return rx @ ry @ rz


def project_landmarks(
    basis: FaceBasis,
    id_para: jnp.ndarray,  # [id_dim] (shared across frames)
    exp_para: jnp.ndarray,  # [T, exp_dim]
    euler: jnp.ndarray,  # [T, 3]
    trans: jnp.ndarray,  # [T, 3]
    focal: jnp.ndarray,  # scalar
    cxy: jnp.ndarray,  # [2]
) -> jnp.ndarray:
    """→ projected 2-D landmarks [T, 68, 2] (pinhole, +z forward)."""
    T = exp_para.shape[0]
    geo = (
        basis.mean[None]
        + (basis.id_base @ id_para)[None]
        + exp_para @ basis.exp_base.T
    ).reshape(T, -1, 3)
    rot = _euler_to_rot(euler)  # [T, 3, 3]
    cam = jnp.einsum("tij,tnj->tni", rot, geo) + trans[:, None, :]
    z = jnp.maximum(cam[..., 2], 1e-5)
    u = focal * cam[..., 0] / z + cxy[0]
    v = focal * cam[..., 1] / z + cxy[1]
    return jnp.stack([u, v], -1)


def _landmark_loss(params, basis, lms, focal, cxy, reg_id, reg_exp):
    pred = project_landmarks(
        basis, params["id"], params["exp"], params["euler"], params["trans"],
        focal, cxy,
    )
    loss = jnp.mean(jnp.sum((pred - lms) ** 2, axis=-1))
    reg = reg_id * jnp.sum(params["id"] ** 2) + reg_exp * jnp.sum(
        params["exp"] ** 2
    )
    return loss + reg


@partial(jax.jit, static_argnames=("steps", "lr"))
def _fit_once(basis, lms, focal, cxy, init, steps: int, lr: float,
              reg_id: float = 1e-4, reg_exp: float = 1e-4):
    tx = optax.adam(lr)
    opt0 = tx.init(init)

    def body(carry, _):
        params, opt = carry
        loss, g = jax.value_and_grad(_landmark_loss)(
            params, basis, lms, focal, cxy, reg_id, reg_exp
        )
        updates, opt = tx.update(g, opt)
        params = optax.apply_updates(params, updates)
        return (params, opt), loss

    (params, _), losses = jax.lax.scan(body, (init, opt0), None, length=steps)
    return params, losses[-1]


# ------------------------------------------------------ photometric stage ----
def _cam_geometry(fb, id_para, exp_para, euler, trans):
    """Full-vertex camera-space geometry [T, V, 3] from a FullFaceBasis."""
    T = exp_para.shape[0]
    geo = (
        fb.mean[None] + (fb.id_base @ id_para)[None] + exp_para @ fb.exp_base.T
    ).reshape(T, -1, 3)
    rot = _euler_to_rot(euler)
    return jnp.einsum("tij,tnj->tni", rot, geo) + trans[:, None, :]


def _photo_loss(
    params, fb, frames_ds, lms, focal, cxy, H, W, scale,
    lambda_col, lambda_lan, lambda_lap, reg_id, reg_exp, z_tau,
):
    """Photometric + landmark + temporal-laplacian objective — semantics of
    the reference's photometric stages (``face_tracker.py:240-380``:
    ``loss_col + loss_lan*w + loss_lap*w + reg``), on the soft splat
    renderer instead of pytorch3d."""
    from geneface_tpu.datagen.face_renderer import (
        photometric_loss,
        render_vertices_soft,
        sh9_irradiance,
        vertex_normals,
    )

    cam = _cam_geometry(
        fb, params["id"], params["exp"], params["euler"], params["trans"]
    )
    T = cam.shape[0]
    albedo = (fb.tex_mean[None] + params["tex"][None] @ fb.tex_base.T).reshape(
        1, -1, 3
    )
    normals = vertex_normals(cam, fb.tris)
    colors = albedo * sh9_irradiance(normals, params["light"])
    rgb, wmap = render_vertices_soft(
        cam, colors, focal, cxy, H, W, scale=scale, z_tau=z_tau
    )
    loss_col = photometric_loss(rgb, wmap, frames_ds)

    lm_cam = cam[:, fb.lm_index, :]
    z = jnp.maximum(lm_cam[..., 2], 1e-5)
    u = focal * lm_cam[..., 0] / z + cxy[0]
    v = focal * lm_cam[..., 1] / z + cxy[1]
    loss_lan = jnp.mean(jnp.sum((jnp.stack([u, v], -1) - lms) ** 2, -1))

    # temporal smoothness: second difference of camera-space vertices
    # (reference cal_lap_loss on the rigid-vertex subset)
    if T >= 3:
        sub = cam[:, :: max(1, cam.shape[1] // 256), :]
        lap = sub[:-2] - 2.0 * sub[1:-1] + sub[2:]
        loss_lap = jnp.mean(jnp.sum(lap**2, -1))
    else:
        loss_lap = jnp.float32(0.0)

    reg = reg_id * jnp.mean(params["id"] ** 2) + reg_exp * jnp.mean(
        params["exp"] ** 2
    )
    total = (
        lambda_col * loss_col
        + lambda_lan * loss_lan
        + lambda_lap * loss_lap
        + reg
    )
    return total, {"col": loss_col, "lan": loss_lan, "lap": loss_lap}


@partial(
    jax.jit,
    static_argnames=(
        "steps", "lr", "H", "W", "scale", "frozen",
    ),
)
def _photo_fit(
    fb, frames_ds, lms, focal, cxy, init, *,
    steps: int, lr: float, H: int, W: int, scale: int,
    frozen: tuple = (),
    lambda_col: float = 1.0, lambda_lan: float = 1e-3,
    lambda_lap: float = 1.0, reg_id: float = 1e-3, reg_exp: float = 1e-3,
    z_tau: float = 0.05,
):
    """Jitted Adam scan over the photometric objective. ``frozen`` names
    params updated with zero learning rate (e.g. ("id", "tex") in the
    per-frame stage)."""
    tx = optax.multi_transform(
        {"train": optax.adam(lr), "frozen": optax.set_to_zero()},
        lambda tree: {
            k: ("frozen" if k in frozen else "train") for k in tree
        },
    )
    opt0 = tx.init(init)

    def body(carry, _):
        params, opt = carry
        (loss, aux), g = jax.value_and_grad(
            lambda p: _photo_loss(
                p, fb, frames_ds, lms, focal, cxy, H, W, scale,
                lambda_col, lambda_lan, lambda_lap, reg_id, reg_exp, z_tau,
            ),
            has_aux=True,
        )(params)
        updates, opt = tx.update(g, opt)
        params = optax.apply_updates(params, updates)
        return (params, opt), aux

    (params, _), auxs = jax.lax.scan(body, (init, opt0), None, length=steps)
    return params, jax.tree_util.tree_map(lambda a: a[-1], auxs)


def refine_photometric(
    track: dict,  # fit_sequence output (euler/trans/id/exp/focal)
    full_basis,  # face_renderer.FullFaceBasis
    frames: np.ndarray,  # [T, H, W, 3] float in [0, 1]
    lms2d: np.ndarray,  # [T, 68, 2]
    H: int,
    W: int,
    *,
    scale: int = 4,
    global_steps: int = 150,
    frame_steps: int = 80,
    photo_batch: int = 50,
    lambda_col: float = 1.0,
    lambda_lan: float = 1e-3,
    lambda_lap: float = 1.0,
    z_tau: float = 0.05,
) -> dict:
    """Photometric refinement of a landmark-only track — the TPU redesign of
    the reference's two photometric stages (``face_tracker.py:225-385``):

    1. **global**: on an evenly-spaced frame subset, jointly fit texture +
       per-frame SH lighting + id/exp/pose against masked rendered-color L2
       (+ landmarks + regs) — one jitted Adam scan, all frames vectorized;
    2. **per-frame**: with id/texture frozen and lighting initialized at the
       subset mean, refine every frame's exp/euler/trans/light in vectorized
       chunks with a temporal-laplacian smoothness term.

    Returns the track dict with refined euler/trans/exp plus tex/light.
    """
    from geneface_tpu.datagen.face_renderer import downsample_frames

    fb = full_basis
    T = lms2d.shape[0]
    lms = jnp.asarray(lms2d, jnp.float32)
    cxy = jnp.asarray([W / 2.0, H / 2.0], jnp.float32)
    focal = jnp.float32(track["focal"])
    tex_dim = fb.tex_base.shape[1]
    frames_ds_all = jnp.asarray(
        downsample_frames(np.asarray(frames, np.float32), scale)
    )

    # ---- stage 1: global (frame subset)
    sel = np.linspace(0, T - 1, min(photo_batch, T)).astype(np.int64)
    init = {
        "id": jnp.asarray(track["id"], jnp.float32),
        "exp": jnp.asarray(track["exp"][sel], jnp.float32),
        "euler": jnp.asarray(track["euler"][sel], jnp.float32),
        "trans": jnp.asarray(track["trans"][sel], jnp.float32),
        "tex": jnp.zeros((tex_dim,), jnp.float32),
        "light": jnp.zeros((len(sel), 27), jnp.float32),
    }
    fitted, aux = _photo_fit(
        fb, frames_ds_all[sel], lms[sel], focal, cxy, init,
        steps=global_steps, lr=0.02, H=H, W=W, scale=scale,
        lambda_col=lambda_col, lambda_lan=lambda_lan, lambda_lap=lambda_lap,
        z_tau=z_tau,
    )
    id_para = fitted["id"]
    tex = fitted["tex"]
    light_mean = jnp.mean(fitted["light"], axis=0)

    # ---- stage 2: per-frame refinement in vectorized chunks
    euler = np.asarray(track["euler"], np.float32).copy()
    trans = np.asarray(track["trans"], np.float32).copy()
    exp = np.asarray(track["exp"], np.float32).copy()
    light = np.tile(np.asarray(light_mean)[None], (T, 1))
    # stage-1 results seed their frames
    euler[sel] = np.asarray(fitted["euler"])
    trans[sel] = np.asarray(fitted["trans"])
    exp[sel] = np.asarray(fitted["exp"])
    light[sel] = np.asarray(fitted["light"])

    B = min(photo_batch, T)
    for lo in range(0, T, B):
        ids = np.arange(lo, min(lo + B, T))
        if len(ids) < B:  # keep the jitted shape static
            ids = np.arange(T - B, T)
        init = {
            "id": id_para,
            "exp": jnp.asarray(exp[ids]),
            "euler": jnp.asarray(euler[ids]),
            "trans": jnp.asarray(trans[ids]),
            "tex": tex,
            "light": jnp.asarray(light[ids]),
        }
        fitted, aux = _photo_fit(
            fb, frames_ds_all[ids], lms[ids], focal, cxy, init,
            steps=frame_steps, lr=0.005, H=H, W=W, scale=scale,
            frozen=("id", "tex"),
            lambda_col=lambda_col, lambda_lan=lambda_lan,
            lambda_lap=lambda_lap, z_tau=z_tau,
        )
        euler[ids] = np.asarray(fitted["euler"])
        trans[ids] = np.asarray(fitted["trans"])
        exp[ids] = np.asarray(fitted["exp"])
        light[ids] = np.asarray(fitted["light"])

    out = dict(track)
    out.update(
        euler=euler, trans=trans, exp=exp,
        id=np.asarray(id_para), tex=np.asarray(tex), light=light,
        photo_loss=float(aux["col"]),
    )
    return out


def fit_sequence(
    lms2d: np.ndarray,  # [T, 68, 2] detected landmarks (pixel coords)
    basis: FaceBasis,
    H: int,
    W: int,
    focal_candidates=tuple(range(600, 1700, 100)),
    coarse_steps: int = 300,
    refine_steps: int = 700,
    coarse_every: int = 40,
    init_z: float = 7.0,  # camera-frame depth (+z in front of the camera)
    seed: int = 0,
) -> dict:
    """Full tracking pipeline (``face_tracker.py:53-180``):

    1. focal grid search on every ``coarse_every``-th frame — each candidate
       fit is an independent jitted Adam run, vmapped over candidates;
    2. joint refinement of (id, exp, euler, trans) over all frames at the
       winning focal.

    Returns dict(euler [T,3], trans [T,3], focal float, id, exp [T, e]).
    """
    lms = jnp.asarray(lms2d, jnp.float32)
    T = lms.shape[0]
    cxy = jnp.asarray([W / 2.0, H / 2.0], jnp.float32)
    id_dim = basis.id_base.shape[1]
    exp_dim = basis.exp_base.shape[1]

    sel = lms[::coarse_every]
    Ts = sel.shape[0]

    def init_params(t):
        return {
            "id": jnp.zeros((id_dim,)),
            "exp": jnp.zeros((t, exp_dim)),
            "euler": jnp.zeros((t, 3)),
            "trans": jnp.tile(
                jnp.asarray([0.0, 0.0, init_z], jnp.float32), (t, 1)
            ),
        }

    focals = jnp.asarray(focal_candidates, jnp.float32)

    fit_coarse = jax.vmap(
        lambda f: _fit_once(
            basis, sel, f, cxy, init_params(Ts), coarse_steps, 0.03
        )[1]
    )
    losses = fit_coarse(focals)
    best = int(jnp.argmin(losses))
    focal = float(focal_candidates[best])

    params, final_loss = _fit_once(
        basis, lms, jnp.float32(focal), cxy, init_params(T),
        refine_steps, 0.01,
    )
    return {
        "euler": np.asarray(params["euler"]),
        "trans": np.asarray(params["trans"]),
        "id": np.asarray(params["id"]),
        "exp": np.asarray(params["exp"]),
        "focal": focal,
        "loss": float(final_loss),
    }
