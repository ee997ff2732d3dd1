"""Deep3DFaceRecon parity: alignment math + torch→flax weight conversion.

The conversion test builds the reference's exact torch architecture
(torchvision ResNet-50 backbone + seven 1×1-conv heads,
``deep_3drecon_models/networks.py:70-106``) with random weights, converts via
``tools/convert_deep3drecon.convert`` and checks numerical agreement of the
257-D coefficient output.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from geneface_tpu.datagen.face_recon import (
    POS,
    Reconstructor,
    align_img,
    extract_5p,
    split_coeff,
)


def test_extract_5p_shape_and_symmetry():
    lm = np.random.RandomState(0).rand(68, 2) * 100
    lm5 = extract_5p(lm)
    assert lm5.shape == (5, 2)
    # point 2 is the nose tip (lm index 30)
    np.testing.assert_allclose(lm5[2], lm[30])


def test_pos_recovers_known_pose():
    rng = np.random.RandomState(1)
    x3 = rng.randn(3, 5)
    s_true, t_true = 2.5, np.array([10.0, -4.0])
    # scaled orthographic projection: xp = s*x[:2] + t
    xp = s_true * x3[:2] + t_true[:, None]
    t, s = POS(xp, x3)
    assert abs(s - s_true) / s_true < 1e-5
    np.testing.assert_allclose(t.reshape(-1), t_true, atol=1e-5)


def test_align_img_output_shape():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (300, 260, 3), dtype=np.uint8)
    lm5 = np.array(
        [[100, 180], [160, 180], [130, 150], [105, 120], [155, 120]], np.float64
    )
    lm3d = np.array(
        [
            [-0.3, 0.3, 0.13], [0.31, 0.29, 0.13], [0.0, -0.05, 0.55],
            [-0.25, -0.38, 0.22], [0.25, -0.38, 0.22],
        ]
    )
    trans, aligned, lm_new = align_img(img, lm5, lm3d)
    assert aligned.shape == (224, 224, 3)
    assert trans.shape == (5,)
    assert lm_new.shape == (5, 2)


def test_split_coeff():
    import jax.numpy as jnp

    c = jnp.arange(257.0)[None]
    d = split_coeff(c)
    assert d["id"].shape == (1, 80) and d["exp"].shape == (1, 64)
    assert d["tex"].shape == (1, 80) and d["angle"].shape == (1, 3)
    assert d["gamma"].shape == (1, 27) and d["trans"].shape == (1, 3)
    assert float(d["exp"][0, 0]) == 80.0 and float(d["trans"][0, -1]) == 256.0


def test_reconstructor_random_weights_end_to_end():
    rng = np.random.RandomState(3)
    imgs = rng.randint(0, 255, (2, 256, 256, 3), dtype=np.uint8)
    lm5 = np.tile(
        np.array(
            [[100, 140], [160, 140], [130, 110], [105, 80], [155, 80]], np.float64
        )[None],
        (2, 1, 1),
    )
    recon = Reconstructor()
    coeff, aligned = recon.recon_coeff(imgs, lm5)
    assert coeff.shape == (2, 257)
    assert aligned.shape == (2, 224, 224, 3) and aligned.dtype == np.uint8
    assert np.isfinite(coeff).all()


@pytest.mark.slow
def test_torch_conversion_parity():
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    torch.manual_seed(0)

    class TorchBottleneck(tnn.Module):
        """torchvision Bottleneck with the reference's key names."""

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.relu = tnn.ReLU()
            self.downsample = downsample

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return self.relu(out + idn)

    class TorchRecon(tnn.Module):
        """Reference ReconNetWrapper (networks.py:70-106), random weights."""

        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU()
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            inplanes = 64
            for stage, (planes, n_blocks) in enumerate(
                zip((64, 128, 256, 512), (3, 4, 6, 3)), start=1
            ):
                blocks = []
                for b in range(n_blocks):
                    stride = 2 if (stage > 1 and b == 0) else 1
                    down = None
                    if b == 0:
                        down = tnn.Sequential(
                            tnn.Conv2d(inplanes, planes * 4, 1, stride,
                                       bias=False),
                            tnn.BatchNorm2d(planes * 4),
                        )
                    blocks.append(TorchBottleneck(inplanes, planes, stride, down))
                    inplanes = planes * 4
                setattr(self, f"layer{stage}", tnn.Sequential(*blocks))
            self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))
            dims = (80, 64, 80, 3, 27, 2, 1)
            self.final_layers = tnn.ModuleList(
                [tnn.Conv2d(2048, d, 1, bias=True) for d in dims]
            )
            # non-trivial weights everywhere (default head init is zeros)
            for m in self.final_layers:
                tnn.init.normal_(m.weight, std=0.02)
                tnn.init.normal_(m.bias, std=0.02)
            # randomize BN running stats so conversion must carry them
            for m in self.modules():
                if isinstance(m, tnn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.1)
                    m.running_var.uniform_(0.5, 1.5)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = self.avgpool(x)
            outs = [layer(x) for layer in self.final_layers]
            return torch.flatten(torch.cat(outs, dim=1), 1)

    tmodel = TorchRecon().eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    from tools.convert_deep3drecon import convert

    variables = convert(sd)

    x = np.random.RandomState(4).rand(2, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    import jax.numpy as jnp

    from geneface_tpu.datagen.face_recon import ReconNet

    got = np.asarray(ReconNet().apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-4)
