"""Validate a reference (torch) RAD-NeRF checkpoint import end-to-end.

VERDICT r4 #5 — the one-command check for the "bit-matched renders" north
star the moment real released weights are available:

    python tools/validate_import.py \
        --ckpt  <reference work dir or model_ckpt_steps_*.ckpt> \
        --data_dir data/binary/videos/May \
        [--config egs/datasets/videos/May/lm3d_radnerf.yaml] \
        [--golden infer_out/May/ref_frames] [--frames 4] \
        [--out import_report.json] [--psnr_pass 30]

Recipe: load the torch checkpoint (``utils/torch_import``), build the SAME
model under the ``block`` grid backend (canonical per-level layout — the
checkpoint-import fast path, docs/migrate_from_geneface.md), convert params
+ density grid, render ``--frames`` evenly-spaced frames from
``trainval_dataset.npy`` with GT conditions, and report per-frame PSNR:

- vs ``--golden`` frames (reference-rendered ``frame_%05d.npy`` [H,W,3]
  float in [0,1], or .png) when provided  → PASS iff every frame clears
  ``--psnr_pass`` dB;
- vs the dataset GT images always (informational — a trained checkpoint
  should land in the PSNR range its TensorBoard reported).

Checkpoint structure citations: ``utils/commons/ckpt_utils.py:26``,
``tasks/radnerfs/radnerf.py`` param tree, ``renderer.py:90-93`` buffers.
Tested with a synthetically-authored torch checkpoint in
``tests/test_validate_import.py``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return float("inf") if mse == 0 else float(-10.0 * np.log10(mse))


def load_golden(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        g = np.load(path)
    else:
        import cv2

        g = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB) / 255.0
    return np.asarray(g, np.float32)


def validate(ckpt: str, data_dir: str, config: str | None = None,
             frames: int = 4, golden: str | None = None,
             psnr_pass: float = 30.0, out: str | None = None,
             dump_frames: str | None = None) -> dict:
    import jax
    import jax.numpy as jnp

    from geneface_tpu.config import Config, load_config
    from geneface_tpu.data.radnerf_dataset import RADNeRFDataset, get_cond_window
    from geneface_tpu.models.radnerf import RADNeRF, RADNeRFTorso
    from geneface_tpu.models.radnerf.renderer import (
        TorsoOccupancyState,
        occupied_kdop,
        render_rays_radnerf,
        render_rays_radnerf_torso,
    )
    from geneface_tpu.tasks.radnerf import model_from_cfg
    from geneface_tpu.utils import torch_import as ti

    # ---- config: --config yaml > <ckpt dir>/config.yaml > defaults
    ckpt_dir = ckpt if os.path.isdir(ckpt) else os.path.dirname(ckpt)
    if config:
        cfg = load_config(config)
    elif os.path.exists(os.path.join(ckpt_dir, "config.yaml")):
        cfg = load_config(os.path.join(ckpt_dir, "config.yaml"))
    else:
        cfg = Config()
    cfg["data_dir"] = data_dir
    # canonical per-level table layout == the torch layout (import fast path)
    cfg["grid_backend"] = "block"

    sd = ti.load_reference_checkpoint(ckpt)
    is_torso = "torso_embedder.embeddings" in sd

    cls = RADNeRFTorso if is_torso else RADNeRF
    extra = (
        dict(
            torso_shrink=cfg.get("torso_shrink", 0.8),
            torso_individual_embedding_dim=cfg.get(
                "torso_individual_embedding_dim", 8
            ),
            torso_head_aware=cfg.get("torso_head_aware", False),
        )
        if is_torso
        else {}
    )
    model = model_from_cfg(cfg, cls, **extra)
    ds = RADNeRFDataset("trainval", data_dir, cfg, training=False)
    smo = cfg.get("smo_win_size", 5)
    cond0 = jnp.asarray(get_cond_window(ds.conds, 0, smo))
    template = model.init(
        jax.random.PRNGKey(0), cond0, jnp.zeros((8, 3)), jnp.zeros((8, 3)),
        method=model.init_all,
    )
    params = ti.radnerf_params_from_torch(sd, template)
    grid_size = int(cfg.get("grid_size", 128))
    occ = ti.occupancy_from_torch(
        sd, grid_size, float(cfg.get("density_thresh", 10))
    )
    torso_occ = None
    if is_torso and "density_grid_torso" in sd:
        tg = ti.torso_density_grid_from_torch(sd, grid_size)
        torso_occ = TorsoOccupancyState(
            density_grid=jnp.asarray(tg.reshape(-1)),
            mean_density=jnp.asarray(tg.mean(), jnp.float32),
        )

    kdop = jax.tree_util.tree_map(
        jnp.asarray, occupied_kdop(occ.occ_grid, float(cfg.get("bound", 1)))
    )
    kwargs = dict(
        bound=float(cfg.get("bound", 1)),
        min_near=float(cfg.get("min_near", 0.05)),
        dt_gamma=float(cfg.get("dt_gamma", 1.0 / 256)),
        max_steps=int(cfg.get("max_steps", 16)),
        grid_size=grid_size,
        # exact full-slab walk: fidelity over speed for validation
        mean_samples_per_ray=None,
        lattice_K=None,
    )

    @jax.jit
    def render(params, occ_pack, ro, rd, bg, bc, cond, pose6):
        cond_feat = model.apply(params, cond, method=model.cal_cond_feat)
        ind_codes = params["params"].get("individual_embeddings")
        ind = ind_codes[0] if ind_codes is not None else None

        def field_fn(x, d):
            return model.apply(params, x, d, cond_feat, ind)

        if torso_occ is not None:
            t_codes = params["params"].get("torso_individual_codes")
            t_ind = t_codes[0] if t_codes is not None else None

            def torso_fn(xy, hi, hw_):
                return model.apply(
                    params, xy, pose6, t_ind, hi, hw_,
                    method=model.forward_torso,
                )

            out = render_rays_radnerf_torso(
                field_fn, torso_fn, ro, rd, bc, occ_pack[0], occ_pack[1],
                density_thresh_torso=float(
                    cfg.get("density_thresh_torso", 0.01)
                ),
                bg_color=bg, **kwargs,
            )
        else:
            out = render_rays_radnerf(
                field_fn, ro, rd, occ_pack[0], bg_color=bg, **kwargs
            )
        return out["rgb_map"]

    occ_pack = (occ, torso_occ) if torso_occ is not None else (occ,)
    idxs = np.linspace(0, len(ds) - 1, frames).astype(int).tolist()
    report = {
        "ckpt": ckpt, "data_dir": data_dir, "torso": bool(is_torso),
        "grid_backend": "block", "frames": [],
    }
    ok = True
    for i in idxs:
        item = ds[i]
        cond = jnp.asarray(get_cond_window(ds.conds, i, smo))
        bg_key = "bg_img" if torso_occ is not None else (
            "bg_torso_img" if "bg_torso_img" in item else "bg_img"
        )
        rgb = np.asarray(
            render(
                params, occ_pack,
                jnp.asarray(item["rays_o"]), jnp.asarray(item["rays_d"]),
                jnp.asarray(item[bg_key]), jnp.asarray(item["bg_coords"]),
                cond, jnp.asarray(item["pose"]),
            )
        ).reshape(ds.H, ds.W, 3)
        entry = {"index": int(i), "finite": bool(np.all(np.isfinite(rgb)))}
        if dump_frames:
            os.makedirs(dump_frames, exist_ok=True)
            np.save(os.path.join(dump_frames, f"frame_{i:05d}.npy"), rgb)
        gt = item.get("gt_img")
        if gt is not None:
            entry["psnr_vs_gt"] = round(
                psnr(rgb, np.asarray(gt).reshape(ds.H, ds.W, 3)), 2
            )
        if golden:
            gpath = os.path.join(golden, f"frame_{i:05d}")
            for ext in (".npy", ".png"):
                if os.path.exists(gpath + ext):
                    g = load_golden(gpath + ext)
                    entry["psnr_vs_golden"] = round(psnr(rgb, g), 2)
                    entry["golden_pass"] = entry["psnr_vs_golden"] >= psnr_pass
                    ok = ok and entry["golden_pass"]
                    break
            else:
                entry["golden_pass"] = False
                entry["golden_missing"] = True
                ok = False
        ok = ok and entry["finite"]
        report["frames"].append(entry)
        print(f"frame {i}: {entry}", flush=True)

    report["pass"] = bool(ok)
    if golden:
        vals = [f.get("psnr_vs_golden") for f in report["frames"]
                if "psnr_vs_golden" in f]
        if vals:
            report["min_psnr_vs_golden"] = min(vals)
    print(f"RESULT: {'PASS' if ok else 'FAIL'}")
    if out:
        with open(out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"report written to {out}")
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="reference work dir or model_ckpt_steps_*.ckpt")
    ap.add_argument("--data_dir", required=True,
                    help="binarized video dir holding trainval_dataset.npy")
    ap.add_argument("--config", default=None)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--golden", default=None,
                    help="dir of reference-rendered frame_%%05d.npy/.png")
    ap.add_argument("--psnr_pass", type=float, default=30.0)
    ap.add_argument("--out", default="import_report.json")
    ap.add_argument("--dump_frames", default=None,
                    help="also save rendered frames as frame_%%05d.npy here")
    a = ap.parse_args()
    report = validate(a.ckpt, a.data_dir, a.config, a.frames, a.golden,
                      a.psnr_pass, a.out, a.dump_frames)
    sys.exit(0 if report["pass"] else 1)


if __name__ == "__main__":
    main()
