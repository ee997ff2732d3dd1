"""VQ-VAE quantizer + model (alternative audio2motion generator)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from geneface_tpu.models.audio2motion.vqvae import (  # noqa: E402
    VectorQuantizer,
    VQVAEModel,
)


def test_vector_quantizer_straight_through():
    vq = VectorQuantizer(dim=32, codebook_size=16, codebook_dim=8)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 32))
    params = vq.init(jax.random.PRNGKey(1), z)
    zq, idx, loss = vq.apply(params, z)
    assert zq.shape == z.shape
    assert idx.shape == (2, 10)
    assert np.all(np.asarray(idx) >= 0) and np.all(np.asarray(idx) < 16)
    assert float(loss) > 0

    # straight-through: gradients flow back to the input
    g = jax.grad(lambda z: jnp.sum(vq.apply(params, z)[0]))(z)
    assert float(jnp.max(jnp.abs(g))) > 0

    # codebook receives gradient through the codebook loss
    gp = jax.grad(lambda p: vq.apply(p, z)[2])(params)
    assert float(jnp.max(jnp.abs(gp["params"]["codebook"]))) > 0


def test_vqvae_model_train_and_infer():
    m = VQVAEModel(in_out_dim=12, hidden_channels=32)
    rng = jax.random.PRNGKey(0)
    hubert = jax.random.normal(jax.random.PRNGKey(1), (2, 40, 1024))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 20, 12))
    mask = jnp.ones((2, 20))
    params = m.init(rng, hubert, x, mask, rng)

    out = m.apply(params, hubert, x, mask, rng)
    assert out["pred"].shape == (2, 20, 12)
    assert np.isfinite(float(out["commit_loss"]))

    y = m.apply(params, hubert, rng, method=m.infer)
    assert y.shape == (2, 20, 12)
    assert np.all(np.isfinite(np.asarray(y)))
