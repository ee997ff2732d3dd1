"""Tests for audio2motion VAE+flow, syncnet, postnet, audio2pose, LLE."""

import jax
import jax.numpy as jnp
import numpy as np

from geneface_tpu.models.audio2motion import (
    FVAE,
    Discriminator,
    Glow,
    ResidualCouplingBlock,
    VAEModel,
    PitchContourVAEModel,
    WN,
)
from geneface_tpu.models.audio2pose import (
    Audio2PoseModel,
    autoregressive_infer,
    gmm_log_loss,
    sample_gmm,
)
from geneface_tpu.models.postnet import CNNPostNet, MLPDiscriminator, PitchContourCNNPostNet
from geneface_tpu.models.postnet.lle import compute_lle_projection
from geneface_tpu.models.syncnet import LandmarkHubertSyncNet, sync_loss


def test_wn_shapes():
    wn = WN(hidden_channels=32, n_layers=3, gin_channels=16)
    x = jnp.ones((2, 20, 32))
    g = jnp.ones((2, 20, 16))
    mask = jnp.ones((2, 20, 1))
    params = wn.init(jax.random.PRNGKey(0), x, mask, g)
    out = wn.apply(params, x, mask, g)
    assert out.shape == (2, 20, 32)


def test_coupling_block_invertible():
    m = ResidualCouplingBlock(channels=16, hidden_channels=32, n_layers=2,
                              n_flows=2, gin_channels=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 16))
    mask = jnp.ones((2, 12, 1))
    g = jax.random.normal(jax.random.PRNGKey(2), (2, 12, 8))
    params = m.init(jax.random.PRNGKey(0), x, mask, g)
    z = m.apply(params, x, mask, g, reverse=False)
    x_back = m.apply(params, z, mask, g, reverse=True)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-4)


def test_glow_invertible_with_logdet():
    m = Glow(in_channels=8, hidden_channels=16, n_blocks=2, n_layers=2,
             n_split=4, n_sqz=2, gin_channels=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8))
    mask = jnp.ones((2, 16, 1))
    g = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 4))
    params = m.init(jax.random.PRNGKey(0), x, mask, g)
    z, logdet = m.apply(params, x, mask, g, reverse=False)
    x_back, logdet_r = m.apply(params, z, mask, g, reverse=True)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(logdet), -np.asarray(logdet_r), atol=1e-3
    )


def test_fvae_train_and_infer():
    m = FVAE(in_out_channels=12, hidden_channels=32, latent_size=8,
             kernel_size=3, enc_n_layers=2, dec_n_layers=2, gin_channels=16,
             glow_hidden=16, glow_n_blocks=2)
    B, T = 2, 32
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, 12))
    mask = jnp.ones((B, T))
    g = jax.random.normal(jax.random.PRNGKey(1), (B, T, 16))
    params = m.init(jax.random.PRNGKey(2), x, mask, g, jax.random.PRNGKey(3))
    x_recon, loss_kl, z_p, m_q, logs_q = m.apply(
        params, x, mask, g, jax.random.PRNGKey(4)
    )
    assert x_recon.shape == (B, T, 12)
    assert np.isfinite(float(loss_kl))
    assert z_p.shape == (B, T // 4, 8)
    # infer: prior sample -> inverse flow -> decode
    x_gen, z = m.apply(params, None, mask, g, jax.random.PRNGKey(5), infer=True)
    assert x_gen.shape == (B, T, 12)
    assert np.all(np.isfinite(np.asarray(x_gen)))


def test_vae_model_end_to_end():
    for cls, extra in [(VAEModel, {}), (PitchContourVAEModel, {})]:
        m = cls(in_out_dim=12)
        B, T = 1, 16  # hubert at 2T
        batch = {
            "hubert": jax.random.normal(jax.random.PRNGKey(0), (B, 2 * T, 1024)),
            "y": jax.random.normal(jax.random.PRNGKey(1), (B, T, 12)),
            "y_mask": jnp.ones((B, T)),
            "f0": jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (B, 2 * T))) * 200,
        }
        params = m.init(jax.random.PRNGKey(3), batch, jax.random.PRNGKey(4))
        out = m.apply(params, batch, jax.random.PRNGKey(5), train=True)
        assert out["pred"].shape == (B, T, 12)
        assert np.isfinite(float(out["loss_kl"]))
        gen = m.apply(params, batch, jax.random.PRNGKey(6), train=False)
        assert gen["pred"].shape == (B, T, 12)


def test_syncnet():
    m = LandmarkHubertSyncNet(lm_dim=60)
    hubert = jax.random.normal(jax.random.PRNGKey(0), (3, 10, 1024))
    mouth = jax.random.normal(jax.random.PRNGKey(1), (3, 5, 60))
    params = m.init(jax.random.PRNGKey(2), hubert, mouth)
    a, v = m.apply(params, hubert, mouth)
    assert a.shape == (3, 512) and v.shape == (3, 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(a), axis=-1), 1.0, atol=1e-5)
    loss, d = sync_loss(a, v, jnp.array([1.0, 0.0, 1.0]))
    assert np.isfinite(float(loss))


def test_postnet_and_disc():
    m = CNNPostNet(in_out_dim=12)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 12))
    x = x.at[0, -2:].set(0.0)  # padding frames
    params = m.init(jax.random.PRNGKey(1), x)
    y = m.apply(params, x)
    assert y.shape == x.shape
    np.testing.assert_allclose(np.asarray(y[0, -2:]), 0.0, atol=1e-6)  # padded stay

    mp = PitchContourCNNPostNet(in_out_dim=12, pitch_dim=8)
    pitch = jax.random.normal(jax.random.PRNGKey(2), (2, 9, 8))
    pparams = mp.init(jax.random.PRNGKey(3), x, pitch)
    yp = mp.apply(pparams, x, pitch)
    assert yp.shape == x.shape

    d = MLPDiscriminator(in_dim=12)
    dparams = d.init(jax.random.PRNGKey(4), x)
    v, mask = d.apply(dparams, x)
    assert v.shape == (2, 9, 1) and mask.shape == (2, 9)
    assert not bool(mask[0, -1])


def test_seq_discriminator():
    m = Discriminator(x_dim=1024, y_dim=12, time_lengths=(8, 16))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 40, 12))
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 80, 1024))
    params = m.init(jax.random.PRNGKey(2), x, mel, (0, 0))
    v = m.apply(params, x, mel, (3, 5))
    assert v.shape == (2, 1)


def test_audio2pose_and_gmm():
    m = Audio2PoseModel(recept_field=8)
    audio = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 58))
    hist = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 12))
    params = m.init(jax.random.PRNGKey(2), audio, hist)
    out = m.apply(params, audio, hist)
    assert out.shape == (2, 8, 25)
    loss = gmm_log_loss(out, jax.random.normal(jax.random.PRNGKey(3), (2, 8, 12)))
    assert np.isfinite(float(loss))
    # sampling with sigma_scale=0 returns the mean
    s = sample_gmm(out, 1, 12, jax.random.PRNGKey(4), sigma_scale=0.0)
    np.testing.assert_allclose(np.asarray(s), np.asarray(out[..., 1:13]), atol=1e-6)
    # autoregressive rollout
    long_audio = jax.random.normal(jax.random.PRNGKey(5), (12, 58))
    poses = autoregressive_infer(m, params, long_audio, jax.random.PRNGKey(6),
                                 init_pose=jnp.zeros(6))
    assert poses.shape == (12, 6)
    assert np.all(np.isfinite(np.asarray(poses)))


def test_lle_projection():
    rng = np.random.RandomState(0)
    db = rng.randn(200, 16).astype(np.float32)
    # points in the database project to themselves
    feats = db[:5]
    fuse, w = compute_lle_projection(jnp.asarray(feats), jnp.asarray(db), K=4)
    np.testing.assert_allclose(np.asarray(fuse), feats, atol=1e-3)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-4)
    # novel points: affine combination constraint holds
    novel = rng.randn(7, 16).astype(np.float32)
    fuse2, w2 = compute_lle_projection(jnp.asarray(novel), jnp.asarray(db), K=5)
    np.testing.assert_allclose(np.asarray(w2).sum(-1), 1.0, atol=1e-4)
