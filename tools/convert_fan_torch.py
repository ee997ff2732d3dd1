"""Convert a face_alignment 2DFAN-4 torch checkpoint to the Flax FAN .npz.

Usage: python tools/convert_fan_torch.py 2DFAN4-cd938726ad.pth.tar fan.npz

The source checkpoint is the published ``face_alignment`` landmark model
(``data_util/process.py:54-55`` downloads it at runtime; this image has no
egress, so conversion runs wherever the file exists). The key mapping below
follows ``face_alignment/models.py`` module registration order; the flax
side is ``geneface_tpu/datagen/face_landmarker.py``.
"""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _conv_w(t):
    # torch [out, in, kh, kw] -> flax [kh, kw, in, out]
    return np.asarray(t).transpose(2, 3, 1, 0)


def _put(flat, path, val):
    flat[path] = np.asarray(val)


def _map_bn(flat, sd, tpath, fscope, idx):
    _put(flat, f"params/{fscope}/BatchNorm_{idx}/scale", sd[f"{tpath}.weight"])
    _put(flat, f"params/{fscope}/BatchNorm_{idx}/bias", sd[f"{tpath}.bias"])
    _put(flat, f"batch_stats/{fscope}/BatchNorm_{idx}/mean",
         sd[f"{tpath}.running_mean"])
    _put(flat, f"batch_stats/{fscope}/BatchNorm_{idx}/var",
         sd[f"{tpath}.running_var"])


def _map_convblock(flat, sd, tpath, fscope):
    """face_alignment ConvBlock -> flax ConvBlock param names."""
    for i, name in enumerate(("bn1", "bn2", "bn3")):
        _map_bn(flat, sd, f"{tpath}.{name}", fscope, i)
    for i, name in enumerate(("conv1", "conv2", "conv3")):
        _put(flat, f"params/{fscope}/Conv_{i}/kernel",
             _conv_w(sd[f"{tpath}.{name}.weight"]))
    if f"{tpath}.downsample.0.weight" in sd:
        _map_bn(flat, sd, f"{tpath}.downsample.0", fscope, 3)
        _put(flat, f"params/{fscope}/downsample_conv/kernel",
             _conv_w(sd[f"{tpath}.downsample.2.weight"]))


def _map_hourglass(flat, sd, tpath, fscope, depth=4):
    for lv in range(depth, 0, -1):
        for blk in ("b1", "b2", "b3"):
            _map_convblock(flat, sd, f"{tpath}.{blk}_{lv}",
                           f"{fscope}/{blk}_{lv}")
    _map_convblock(flat, sd, f"{tpath}.b2_plus_1", f"{fscope}/b2_plus_1")


def fan_flat_from_torch(sd: dict, num_modules: int = 4) -> dict:
    """torch state_dict (name -> ndarray) -> flat flax variables dict
    ('params/...' / 'batch_stats/...' with '/'-joined paths)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    flat = {}
    _put(flat, "params/conv1/kernel", _conv_w(sd["conv1.weight"]))
    _put(flat, "params/conv1/bias", sd["conv1.bias"])
    _map_bn(flat, sd, "bn1", "", 0)
    for name in ("conv2", "conv3", "conv4"):
        _map_convblock(flat, sd, name, name)
    for i in range(num_modules):
        _map_hourglass(flat, sd, f"m{i}", f"m{i}")
        _map_convblock(flat, sd, f"top_m_{i}", f"top_m_{i}")
        _put(flat, f"params/conv_last{i}/kernel",
             _conv_w(sd[f"conv_last{i}.weight"]))
        _put(flat, f"params/conv_last{i}/bias", sd[f"conv_last{i}.bias"])
        _map_bn(flat, sd, f"bn_end{i}", "", 1 + i)
        _put(flat, f"params/l{i}/kernel", _conv_w(sd[f"l{i}.weight"]))
        _put(flat, f"params/l{i}/bias", sd[f"l{i}.bias"])
        if i < num_modules - 1:
            _put(flat, f"params/bl{i}/kernel", _conv_w(sd[f"bl{i}.weight"]))
            _put(flat, f"params/bl{i}/bias", sd[f"bl{i}.bias"])
            _put(flat, f"params/al{i}/kernel", _conv_w(sd[f"al{i}.weight"]))
            _put(flat, f"params/al{i}/bias", sd[f"al{i}.bias"])
    # normalize '' scope -> top-level keys like 'params//BatchNorm_0/...'
    return {k.replace("//", "/"): v for k, v in flat.items()}


def main():
    src, dst = sys.argv[1], sys.argv[2]
    import torch

    ckpt = torch.load(src, map_location="cpu", weights_only=True)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items()}
    flat = fan_flat_from_torch(sd)

    # validate against the flax template
    import jax
    import jax.numpy as jnp

    from geneface_tpu.datagen.face_landmarker import FAN

    tmpl = FAN().init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    from flax.traverse_util import flatten_dict

    tflat = {"/".join(k): v for k, v in flatten_dict(tmpl).items()}
    missing = set(tflat) - set(flat)
    extra = set(flat) - set(tflat)
    assert not missing and not extra, (sorted(missing)[:5], sorted(extra)[:5])
    for k in tflat:
        assert tflat[k].shape == flat[k].shape, (k, tflat[k].shape, flat[k].shape)
    np.savez(dst, **flat)
    print(f"wrote {dst}: {len(flat)} arrays")


if __name__ == "__main__":
    main()
