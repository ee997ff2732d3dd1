"""Convert the reference BiSeNet face-parsing checkpoint (``79999_iter.pth``,
``data_util/face_parsing/model.py`` convention) into the flattened ``.npz``
read by ``geneface_tpu.datagen.face_parser.load_parser_npz``.

Usage:  python tools/convert_bisenet_torch.py --ckpt 79999_iter.pth \
            --out bisenet_face.npz

The flax module tree mirrors the torch attribute paths one-to-one, so the
mapping is mechanical: torch ``a.b.conv.weight`` (OIHW) → flax
``params/a/b/conv/kernel`` (HWIO); BatchNorm weight/bias → scale/bias under
``params``; running_mean/var → mean/var under ``batch_stats``. Golden test:
``tests/test_face_parser_golden.py`` (reference model with random weights →
convert → bit-compare forward passes).
"""

from __future__ import annotations

import argparse

import numpy as np


def _flax_path(torch_key: str) -> tuple[str, str] | None:
    """torch state_dict key → (collection, flax 'a/b/c' path), or None to
    skip (num_batches_tracked, aux output heads unused at inference)."""
    parts = torch_key.split(".")
    if parts[-1] == "num_batches_tracked":
        return None
    # aux heads conv_out16/conv_out32 are train-time-only deep supervision
    if parts[0] in ("conv_out16", "conv_out32"):
        return None
    # resnet layerN.M → layerN_M (flax names can't hold dots)
    mapped = []
    i = 0
    while i < len(parts) - 1:
        p = parts[i]
        if p.startswith("layer") and i + 1 < len(parts) - 1 and parts[i + 1].isdigit():
            mapped.append(f"{p}_{parts[i + 1]}")
            i += 2
            continue
        if p == "downsample" and parts[i + 1].isdigit():
            # torch Sequential(conv, bn) → downsample_conv / downsample_bn
            mapped.append(
                "downsample_conv" if parts[i + 1] == "0" else "downsample_bn"
            )
            i += 2
            continue
        mapped.append(p)
        i += 1
    leaf = parts[-1]
    path = "/".join(mapped)
    if leaf == "weight":
        return ("params", f"{path}/kernel")  # conv OR bn (disambiguated by shape)
    if leaf == "bias":
        return ("params", f"{path}/bias")
    if leaf == "running_mean":
        return ("batch_stats", f"{path}/mean")
    if leaf == "running_var":
        return ("batch_stats", f"{path}/var")
    raise ValueError(f"unhandled key {torch_key}")


def convert_state_dict(state: dict) -> dict:
    """torch state_dict (tensors or numpy) → flat {npz_key: array}."""
    out = {}
    for k, v in state.items():
        dest = _flax_path(k)
        if dest is None:
            continue
        coll, path = dest
        arr = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        if arr.ndim == 4:  # conv OIHW -> HWIO
            arr = arr.transpose(2, 3, 1, 0)
        elif arr.ndim == 1 and path.endswith("/kernel"):
            # 1-D "weight" is a BatchNorm scale, not a conv kernel
            path = path[: -len("/kernel")] + "/scale"
        out[f"{coll}/{path}"] = arr.astype(np.float32)
    return out


def convert(ckpt_path: str, out_path: str) -> None:
    import torch

    state = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if not isinstance(state, dict) or "cp.resnet.conv1.weight" not in state:
        state = state.get("state_dict", state)
    np.savez(out_path, **convert_state_dict(state))
    print(f"wrote {out_path} ({len(convert_state_dict(state))} arrays)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", default="bisenet_face.npz")
    a = ap.parse_args()
    convert(a.ckpt, a.out)
