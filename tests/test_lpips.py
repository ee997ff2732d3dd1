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
