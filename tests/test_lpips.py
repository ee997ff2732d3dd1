"""LPIPS perceptual criterion + lip fine-tune phase wiring."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.make_synthetic_dataset import make_dataset  # noqa: E402

from geneface_tpu.models.lpips import LPIPS, lpips_params_from_npz  # noqa: E402


def test_lpips_basic_properties():
    m = LPIPS()
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    y = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(2), x, y)

    d_xx = m.apply(params, x, x)
    d_xy = m.apply(params, x, y)
    d_yx = m.apply(params, y, x)
    assert d_xy.shape == (2,)
    np.testing.assert_allclose(np.asarray(d_xx), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_xy), np.asarray(d_yx), rtol=1e-5)
    assert np.all(np.asarray(d_xy) > 0)
    # a small perturbation is perceptually closer than an unrelated image
    d_near = m.apply(params, x, jnp.clip(x + 0.01, 0, 1))
    assert np.all(np.asarray(d_near) < np.asarray(d_xy))


def test_lpips_npz_roundtrip(tmp_path):
    m = LPIPS()
    x = jnp.zeros((1, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(0), x, x)
    arrays = {}
    for i in range(5):
        conv = params["params"]["alex"][f"conv{i}"]
        arrays[f"conv{i}/kernel"] = np.asarray(conv["kernel"])
        arrays[f"conv{i}/bias"] = np.asarray(conv["bias"])
        arrays[f"lin{i}"] = np.asarray(params["params"][f"lin{i}"])
    path = str(tmp_path / "lpips.npz")
    np.savez(path, **arrays)

    loaded = lpips_params_from_npz(path)
    a = jax.random.uniform(jax.random.PRNGKey(3), (1, 32, 32, 3))
    b = jax.random.uniform(jax.random.PRNGKey(4), (1, 32, 32, 3))
    np.testing.assert_allclose(
        np.asarray(m.apply(params, a, b)),
        np.asarray(m.apply(loaded, a, b)),
        rtol=1e-6,
    )


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth_lip")
    make_dataset(str(d), n_frames=6, hw=64)
    return str(d)


def test_lip_finetune_phase(synth_dir, tmp_path):
    from tests.test_radnerf_training import tiny_cfg

    from geneface_tpu.tasks.radnerf import RADNeRFTask

    cfg = tiny_cfg(
        synth_dir,
        str(tmp_path / "work"),
        finetune_lips=True,
        finetune_lips_start_iter=1,
        allow_random_lpips=True,
        lip_patch_size=32,
        lambda_lpips_loss=0.01,
        update_extra_interval=100,
    )
    task = RADNeRFTask(cfg)
    state = task.build()
    rng = jax.random.PRNGKey(0)
    batches = task.train_batches(0)

    saw_lpips = False
    for i in range(6):
        rng, k = jax.random.split(rng)
        state, losses = task.train_step(state, next(batches), k)
        if "lpips_loss" in losses:
            saw_lpips = True
            assert np.isfinite(float(losses["lpips_loss"]))
        assert np.isfinite(float(losses["total_loss"]))
    assert saw_lpips, "lip phase never produced a perceptual loss"


def test_lpips_golden_vs_torch_oracle(tmp_path):
    """Converter + architecture golden: a torch AlexNet-LPIPS oracle with
    random weights, converted via ``tools.convert_lpips_torch
    .convert_from_modules``, must match our Flax LPIPS to float tolerance.

    (The pip ``lpips`` package / pretrained weights are not shipped in this
    image — with them the same path imports the published weights.)
    """
    torch = pytest.importorskip("torch")
    from tools.convert_lpips_torch import convert_from_modules

    from geneface_tpu.models.lpips import load_lpips_npz

    torch.manual_seed(0)
    cfg = ((3, 64, 11, 4, 2), (64, 192, 5, 1, 2), (192, 384, 3, 1, 1),
           (384, 256, 3, 1, 1), (256, 256, 3, 1, 1))
    convs = [torch.nn.Conv2d(i, o, k, s, p) for (i, o, k, s, p) in cfg]
    for c in convs:
        torch.nn.init.normal_(c.weight, std=0.05)
        torch.nn.init.normal_(c.bias, std=0.05)
    lin_ws = [torch.rand(1, c.out_channels, 1, 1) for c in convs]

    def torch_lpips(x, y):
        # the published LPIPS formula (lpips package, net='alex'):
        # scaling layer -> 5 relu conv stages (pools before stages 1, 2)
        # -> unit-normalize -> weighted squared diff -> spatial mean -> sum
        shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

        def feats(t):
            t = (t - shift) / scale
            out = []
            for i, conv in enumerate(convs):
                if i in (1, 2):
                    t = torch.nn.functional.max_pool2d(t, 3, 2)
                t = torch.relu(conv(t))
                out.append(t)
            return out

        total = 0.0
        for f_x, f_y, w in zip(feats(x), feats(y), lin_ws):
            nx = f_x / (f_x.square().sum(1, keepdim=True).sqrt() + 1e-10)
            ny = f_y / (f_y.square().sum(1, keepdim=True).sqrt() + 1e-10)
            d = ((nx - ny) ** 2 * torch.relu(w)).sum(1)
            total = total + d.mean(dim=(1, 2))
        return total

    npz = str(tmp_path / "lpips.npz")
    np.savez(npz, **convert_from_modules(convs, lin_ws))
    model, params = load_lpips_npz(npz, input_range="pm1")

    rng = np.random.RandomState(0)
    x = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    y = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ref = torch_lpips(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(y.transpose(0, 3, 1, 2)),
        ).numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_lip_finetune_requires_weights(synth_dir, tmp_path):
    """Random-init LPIPS measurably degrades the lip region
    (tools/lpips_lip_study.py: lip-rect PSNR 33.8 vs 35.7 with the phase
    off) — an unconfigured lip phase must fail fast."""
    import pytest

    from tests.test_radnerf_training import tiny_cfg

    from geneface_tpu.tasks.radnerf import RADNeRFTask

    cfg = tiny_cfg(
        synth_dir, str(tmp_path / "w2"),
        finetune_lips=True, finetune_lips_start_iter=1,
    )
    with pytest.raises(ValueError, match="lpips_weights"):
        RADNeRFTask(cfg).build()
