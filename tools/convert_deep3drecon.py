"""Convert the public Deep3DFaceRecon_pytorch checkpoint to flax params.

Usage: python tools/convert_deep3drecon.py <epoch_20.pth> <out.npz>

Maps the torch ``net_recon`` state dict (torchvision ResNet-50 +
``final_layers`` 1x1 heads, ``deep_3drecon_models/networks.py:70-106``) onto
:class:`geneface_tpu.datagen.face_recon.ReconNet`'s flax pytree. Weight layout
changes: torch conv [O, I, kh, kw] → flax [kh, kw, I, O]; batch-norm
weight/bias/running_mean/running_var → scale/bias/mean/var.
"""

import pickle
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def convert(state_dict):
    """torch state dict (possibly prefixed ``net_recon.``) → flax variables."""
    sd = {}
    for k, v in state_dict.items():
        k = k.replace("net_recon.", "").replace("backbone.", "")
        sd[k] = np.asarray(v)

    params: dict = {}
    stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def bn(prefix, flax_name, tree_path):
        put(params, tree_path + (flax_name, "scale"), sd[f"{prefix}.weight"])
        put(params, tree_path + (flax_name, "bias"), sd[f"{prefix}.bias"])
        put(stats, tree_path + (flax_name, "mean"), sd[f"{prefix}.running_mean"])
        put(stats, tree_path + (flax_name, "var"), sd[f"{prefix}.running_var"])

    # stem
    put(params, ("Conv_0", "kernel"), _conv(sd["conv1.weight"]))
    bn("bn1", "BatchNorm_0", ())

    # bottleneck stages: flax names _Bottleneck_{i} in definition order
    layers = (3, 4, 6, 3)
    bidx = 0
    for stage, n_blocks in enumerate(layers, start=1):
        for b in range(n_blocks):
            t = f"layer{stage}.{b}"
            bt = (f"_Bottleneck_{bidx}",)
            put(params, bt + ("Conv_0", "kernel"), _conv(sd[f"{t}.conv1.weight"]))
            bn(f"{t}.bn1", "BatchNorm_0", bt)
            put(params, bt + ("Conv_1", "kernel"), _conv(sd[f"{t}.conv2.weight"]))
            bn(f"{t}.bn2", "BatchNorm_1", bt)
            put(params, bt + ("Conv_2", "kernel"), _conv(sd[f"{t}.conv3.weight"]))
            bn(f"{t}.bn3", "BatchNorm_2", bt)
            if f"{t}.downsample.0.weight" in sd:
                put(params, bt + ("Conv_3", "kernel"),
                    _conv(sd[f"{t}.downsample.0.weight"]))
                bn(f"{t}.downsample.1", "BatchNorm_3", bt)
            bidx += 1

    # heads: final_layers.{i}.{weight,bias} (conv1x1)
    for i in range(7):
        put(params, (f"head_{i}", "kernel"), _conv(sd[f"final_layers.{i}.weight"]))
        put(params, (f"head_{i}", "bias"), sd[f"final_layers.{i}.bias"])

    return {"params": params, "batch_stats": stats}


def main():
    import torch

    ckpt_path, out_path = sys.argv[1], sys.argv[2]
    ckpt = torch.load(ckpt_path, map_location="cpu")
    state = ckpt.get("net_recon", ckpt.get("state_dict", ckpt))
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    variables = convert({k: v.numpy() for k, v in state.items()})

    # shape-check against the flax module before saving
    import jax.numpy as jnp

    from geneface_tpu.datagen.face_recon import ReconNet

    out = ReconNet().apply(variables, jnp.zeros((1, 224, 224, 3)), train=False)
    assert out.shape == (1, 257), out.shape
    blob = pickle.dumps(variables)
    np.savez_compressed(out_path, params=np.frombuffer(blob, np.uint8))
    print(f"wrote {out_path} ({len(blob)/1e6:.1f} MB), forward OK")


if __name__ == "__main__":
    main()
