"""VQ-VAE landmark generator — the quantized-latent alternative to FVAE.

Re-design of ``modules/audio2motion/vqvae.py`` (``VQVAE:67``,
``VQVAEModel:136``). The reference quantizes the encoder output with
``vector_quantize_pytorch.VectorQuantize(dim=hidden, codebook_size=256,
codebook_dim=16)`` — a projected codebook with EMA updates. Here the
quantizer is a functional Flax module using the classic VQ-VAE objective
(straight-through estimator + codebook loss ``||sg(z)−e||²`` + commitment
``β||z−sg(e)||²``) so the whole train step stays a pure jitted function —
no mutable EMA buffers (deliberate TPU-native divergence, same capability).

Inference samples uniform codebook indices and decodes, as the reference
(``vqvae.py:118-135``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from geneface_tpu.models.audio2motion.vae import FVAEDecoder, FVAEEncoder

__all__ = ["VectorQuantizer", "VQVAE", "VQVAEModel"]


class VectorQuantizer(nn.Module):
    """Projected-codebook vector quantizer.

    ``dim``-sized inputs are projected to ``codebook_dim``, matched to the
    nearest of ``codebook_size`` codes (L2), and projected back. Returns
    ``(quantized, indices, commit_loss)`` with straight-through gradients,
    mirroring the external package the reference wraps (``vqvae.py:90``).
    """

    dim: int
    codebook_size: int = 256
    codebook_dim: int = 16
    beta: float = 0.25

    def setup(self):
        self.codebook = self.param(
            "codebook",
            nn.initializers.normal(stddev=1.0),
            (self.codebook_size, self.codebook_dim),
        )
        self.project_in = nn.Dense(self.codebook_dim)
        self.project_out = nn.Dense(self.dim)

    def __call__(self, z):
        # z: [B, T, dim]
        zp = self.project_in(z)
        # nearest code by L2: argmin ||zp - e||^2 = argmin (e.e - 2 zp.e)
        dots = jnp.einsum("btc,kc->btk", zp, self.codebook)
        e_sq = jnp.sum(self.codebook**2, axis=-1)
        idx = jnp.argmin(e_sq[None, None, :] - 2.0 * dots, axis=-1)  # [B, T]
        e = self.codebook[idx]  # [B, T, codebook_dim]

        codebook_loss = jnp.mean((jax.lax.stop_gradient(zp) - e) ** 2)
        commit_loss = jnp.mean((zp - jax.lax.stop_gradient(e)) ** 2)
        loss = codebook_loss + self.beta * commit_loss

        e_st = zp + jax.lax.stop_gradient(e - zp)  # straight-through
        zq = self.project_out(e_st)
        return zq, idx, loss

    def decode_indices(self, idx):
        """Codebook lookup + out-projection for sampled indices [B, T]."""
        return self.project_out(self.codebook[idx])


class VQVAE(nn.Module):
    """Conditional VQ-VAE over landmark sequences (``vqvae.py:67-135``)."""

    in_out_channels: int = 64
    hidden_channels: int = 256
    kernel_size: int = 3
    enc_n_layers: int = 5
    dec_n_layers: int = 5
    gin_channels: int = 80
    strides: tuple = (4,)
    codebook_size: int = 256
    codebook_dim: int = 16

    def setup(self):
        s = self.strides[0]
        self.g_pre_net = nn.Conv(
            self.gin_channels, (s * 2,), strides=(s,),
            padding=((s // 2, s - s // 2),),
        )
        self.encoder = FVAEEncoder(
            self.hidden_channels, self.hidden_channels, self.kernel_size,
            self.enc_n_layers, self.gin_channels, self.strides,
        )
        self.vq = VectorQuantizer(
            dim=self.hidden_channels,
            codebook_size=self.codebook_size,
            codebook_dim=self.codebook_dim,
        )
        self.decoder = FVAEDecoder(
            self.hidden_channels, self.in_out_channels, self.kernel_size,
            self.dec_n_layers, self.gin_channels, self.strides,
        )

    def __call__(self, x, x_mask, g, rng):
        """Training path: x [B,T,C], x_mask [B,T,1], g [B,T,C_g].

        Returns (x_recon, commit_loss, z_q, m_q, logs_q)."""
        g_sqz = self.g_pre_net(g)
        z_q, m_q, logs_q, _ = self.encoder(x, x_mask, g_sqz, rng)
        zq, _idx, commit_loss = self.vq(z_q)
        x_recon = self.decoder(zq, x_mask, g)
        return x_recon, commit_loss, zq, m_q, logs_q

    def infer(self, g, rng):
        """Sample uniform codebook indices and decode (``vqvae.py:118-135``)."""
        g_sqz = self.g_pre_net(g)
        B, T_sqz = g_sqz.shape[0], g_sqz.shape[1]
        idx = jax.random.randint(rng, (B, T_sqz), 0, self.codebook_size)
        zq = self.vq.decode_indices(idx)
        ones = jnp.ones((B, g.shape[1], 1))
        return self.decoder(zq, ones, g)


class VQVAEModel(nn.Module):
    """HuBERT-conditioned wrapper (``vqvae.py:136-184``): audio encoder →
    VQVAE over idexp landmarks. Mirrors :class:`VAEModel`'s interface."""

    in_out_dim: int = 64
    audio_in_dim: int = 1024
    hidden_channels: int = 256

    def setup(self):
        self.audio_encoder = nn.Sequential(
            [
                nn.Conv(64, (3,), padding="SAME"),
                nn.relu,
                nn.Conv(64, (3,), padding="SAME"),
            ]
        )
        self.vae = VQVAE(
            in_out_channels=self.in_out_dim,
            hidden_channels=self.hidden_channels,
            gin_channels=64,
        )

    def _cond(self, hubert):
        # 2x temporal downsample of the 50 Hz HuBERT track to the 25 fps
        # landmark rate, as VAEModel (reference vae.py:307-318)
        cond = self.audio_encoder(hubert)
        return 0.5 * (cond[:, ::2][:, : cond.shape[1] // 2]
                      + cond[:, 1::2][:, : cond.shape[1] // 2])

    def __call__(self, hubert, x, x_mask, rng):
        cond = self._cond(hubert)
        T = min(x.shape[1], cond.shape[1])
        x_recon, commit, zq, m_q, logs_q = self.vae(
            x[:, :T], x_mask[:, :T, None], cond[:, :T], rng
        )
        return {
            "pred": x_recon,
            "commit_loss": commit,
            "z_q": zq,
            "m_q": m_q,
            "logs_q": logs_q,
        }

    def infer(self, hubert, rng):
        cond = self._cond(hubert)
        return self.vae.infer(cond, rng)
