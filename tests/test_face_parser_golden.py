"""BiSeNet face parser vs the reference torch implementation.

The pretrained ``79999_iter.pth`` is not shipped in this image, so the
golden test instantiates the REFERENCE model (imported from the read-only
checkout) with random weights, runs ``tools/convert_bisenet_torch.py`` on
its state_dict, loads the result into our Flax BiSeNet, and compares the
forward passes — validating both the converter mapping and the layer-exact
architecture (frozen-BN eval semantics). With the real checkpoint the same
path produces the published parser.
"""

import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

torch = pytest.importorskip("torch")

REF = "/root/reference/data_util/face_parsing"


@pytest.fixture(scope="module")
def ref_bisenet():
    if not os.path.isdir(REF):
        pytest.skip("reference checkout not available")
    # the reference imports torchvision (absent here) and downloads resnet18
    # weights in Resnet18.init_weight — stub both out
    sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))
    sys.path.insert(0, REF)
    import torch.utils.model_zoo as modelzoo

    orig = modelzoo.load_url
    modelzoo.load_url = lambda *a, **k: {}
    try:
        import importlib

        resnet_mod = importlib.import_module("resnet")
        model_mod = importlib.import_module("model")
        net = model_mod.BiSeNet(n_classes=19)
    finally:
        modelzoo.load_url = orig
        sys.path.remove(REF)
    assert resnet_mod is not None
    torch.manual_seed(0)
    # randomize everything incl. BN running stats so the eval path is
    # genuinely exercised
    state = net.state_dict()
    g = torch.Generator().manual_seed(1)
    for k, v in state.items():
        if v.dtype.is_floating_point:
            if k.endswith("running_var"):
                state[k] = torch.rand(v.shape, generator=g) + 0.5
            else:
                state[k] = torch.randn(v.shape, generator=g) * 0.1
    net.load_state_dict(state)
    net.eval()
    return net


def test_convert_and_forward_match(ref_bisenet, tmp_path):
    from tools.convert_bisenet_torch import convert_state_dict

    from geneface_tpu.datagen.face_parser import BiSeNet, load_parser_npz

    flat = convert_state_dict(ref_bisenet.state_dict())
    npz = str(tmp_path / "bisenet.npz")
    np.savez(npz, **flat)

    model, variables = load_parser_npz(npz)
    assert isinstance(model, BiSeNet)

    rng = np.random.RandomState(0)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_bisenet(torch.from_numpy(x.transpose(0, 3, 1, 2)))[0]
    ref_np = ref_out.numpy().transpose(0, 2, 3, 1)

    import jax.numpy as jnp

    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert ours.shape == ref_np.shape
    np.testing.assert_allclose(ours, ref_np, rtol=2e-3, atol=2e-4)


def test_parse_frame_regions(ref_bisenet, tmp_path):
    from tools.convert_bisenet_torch import convert_state_dict

    from geneface_tpu.datagen.face_parser import load_parser_npz, parse_frame

    npz = str(tmp_path / "bisenet.npz")
    np.savez(npz, **convert_state_dict(ref_bisenet.state_dict()))
    model, variables = load_parser_npz(npz)
    frame = (np.random.RandomState(1).rand(64, 64, 3) * 255).astype(np.uint8)
    mask = parse_frame(model, variables, frame)
    assert mask.shape == (64, 64)
    assert set(np.unique(mask)).issubset({0, 1, 2, 3})
