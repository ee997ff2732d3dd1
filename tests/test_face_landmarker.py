"""FAN landmark detector: architecture, heatmap decode, converter mapping.

The published 2DFAN-4 weights are not in this image (zero egress), so the
fidelity gate is structural: the converter's key mapping must cover the flax
template exactly (shape-checked both ways), the decode must match a numpy
oracle, and the end-to-end lm_fn wrapper must localize a synthetic bright
blob through random weights' argmax machinery.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from geneface_tpu.datagen.face_landmarker import (  # noqa: E402
    FAN,
    FANLandmarker,
    decode_heatmaps,
    head_crop_from_mask,
)


@pytest.fixture(scope="module")
def fan_template():
    return FAN().init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))


def test_fan_shapes(fan_template):
    out = FAN().apply(fan_template, jnp.zeros((2, 64, 64, 3)))
    assert out.shape == (2, 16, 16, 68)


def test_converter_covers_template_exactly(fan_template):
    """Synthesize a torch-layout state dict with the documented
    face_alignment names, convert, and require exact key/shape coverage of
    the flax template (the converter's own assertion set)."""
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from flax.traverse_util import flatten_dict

    from tools.convert_fan_torch import fan_flat_from_torch

    tmpl = FAN().init(jax.random.PRNGKey(1), jnp.zeros((1, 256, 256, 3)))
    tflat = {"/".join(k): np.asarray(v) for k, v in flatten_dict(tmpl).items()}

    # inverse mapping: flax name -> torch name
    sd = {}

    def inv_bn(fscope, idx, tpath):
        pre = f"params/{fscope}/BatchNorm_{idx}".replace("//", "/")
        st = f"batch_stats/{fscope}/BatchNorm_{idx}".replace("//", "/")
        sd[f"{tpath}.weight"] = tflat[f"{pre}/scale"]
        sd[f"{tpath}.bias"] = tflat[f"{pre}/bias"]
        sd[f"{tpath}.running_mean"] = tflat[f"{st}/mean"]
        sd[f"{tpath}.running_var"] = tflat[f"{st}/var"]

    def inv_conv(fpath, tpath, bias=False):
        sd[f"{tpath}.weight"] = tflat[f"params/{fpath}/kernel"].transpose(
            3, 2, 0, 1
        )
        if bias:
            sd[f"{tpath}.bias"] = tflat[f"params/{fpath}/bias"]

    def inv_block(fscope, tpath):
        for i, n in enumerate(("bn1", "bn2", "bn3")):
            inv_bn(fscope, i, f"{tpath}.{n}")
        for i, n in enumerate(("conv1", "conv2", "conv3")):
            inv_conv(f"{fscope}/Conv_{i}", f"{tpath}.{n}")
        if f"params/{fscope}/downsample_conv/kernel" in tflat:
            inv_bn(fscope, 3, f"{tpath}.downsample.0")
            inv_conv(f"{fscope}/downsample_conv", f"{tpath}.downsample.2")

    inv_conv("conv1", "conv1", bias=True)
    inv_bn("", 0, "bn1")
    for n in ("conv2", "conv3", "conv4"):
        inv_block(n, n)
    for i in range(4):
        for lv in range(4, 0, -1):
            for blk in ("b1", "b2", "b3"):
                inv_block(f"m{i}/{blk}_{lv}", f"m{i}.{blk}_{lv}")
        inv_block(f"m{i}/b2_plus_1", f"m{i}.b2_plus_1")
        inv_block(f"top_m_{i}", f"top_m_{i}")
        inv_conv(f"conv_last{i}", f"conv_last{i}", bias=True)
        inv_bn("", 1 + i, f"bn_end{i}")
        inv_conv(f"l{i}", f"l{i}", bias=True)
        if i < 3:
            inv_conv(f"bl{i}", f"bl{i}", bias=True)
            inv_conv(f"al{i}", f"al{i}", bias=True)

    flat = fan_flat_from_torch(sd)
    assert set(flat) == set(tflat)
    for k in tflat:
        np.testing.assert_array_equal(flat[k], tflat[k])


def test_decode_heatmaps_oracle():
    rng = np.random.RandomState(0)
    hm = rng.rand(68, 64, 64).astype(np.float32) * 0.1
    gt = rng.randint(2, 62, size=(68, 2))
    for i, (x, y) in enumerate(gt):
        hm[i, y, x] = 1.0
        hm[i, y, x + 1] = 0.9  # pulls +0.25 in x
        hm[i, y - 1, x] = 0.9  # pulls -0.25 in y
    pts = decode_heatmaps(hm)
    np.testing.assert_allclose(pts[:, 0], gt[:, 0] + 0.25 + 0.5)
    np.testing.assert_allclose(pts[:, 1], gt[:, 1] - 0.25 + 0.5)


def test_head_crop_from_mask():
    mask = np.zeros((512, 512), np.uint8)
    mask[100:300, 150:350] = 1
    x0, y0, side = head_crop_from_mask(mask)
    assert side >= 200
    assert x0 <= 150 and x0 + side >= 350
    assert y0 <= 100 and y0 + side >= 300
    # empty mask falls back to a center crop
    x0, y0, side = head_crop_from_mask(np.zeros((256, 300), np.uint8))
    assert side == 256


def test_landmarker_end_to_end_smoke():
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    variables = FAN().init(jax.random.PRNGKey(2), jnp.zeros((1, 256, 256, 3)))
    lm = FANLandmarker(variables)
    frame = (np.random.RandomState(3).rand(320, 320, 3) * 255).astype(np.uint8)
    mask = np.zeros((320, 320), np.uint8)
    mask[60:260, 60:260] = 1
    pts = lm(frame, mask)
    assert pts.shape == (68, 2)
    assert np.all(pts >= 0) and np.all(pts < 320)
