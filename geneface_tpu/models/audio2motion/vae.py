"""Audio2Motion VAE: HuBERT-conditioned landmark-sequence generator.

Flax re-implementations of ``modules/audio2motion/vae.py``:
- ``FVAEEncoder:98`` / ``FVAEDecoder:126``: strided conv pre-net (×4 temporal
  down/upsample) around a WaveNet core, 16-D latent.
- ``FVAE:149``: conditional VAE with a **normalizing-flow prior**
  (``ResidualCouplingBlock`` glow); KL computed against the flowed latent;
  inference samples the prior and inverts the flow. Optional ``sqz_prior``
  style-attention pooling.
- ``VAEModel:273`` / ``PitchContourVAEModel:343``: wrap FVAE with a
  HuBERT(1024)→64 conv encoder (+ f0 pitch embedding for the pitch variant);
  conditions are 2× nearest-downsampled in time.

Layout: channel-last ``[B, T, C]``; masks ``[B, T]``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from geneface_tpu.models.audio2motion.flow import WN, ResidualCouplingBlock
from geneface_tpu.utils.pitch import f0_to_coarse

__all__ = ["FVAE", "FVAEEncoder", "FVAEDecoder", "VAEModel", "PitchContourVAEModel"]


class FVAEEncoder(nn.Module):
    hidden_channels: int
    latent_channels: int
    kernel_size: int
    n_layers: int
    gin_channels: int = 0
    strides: tuple = (4,)

    @nn.compact
    def __call__(self, x, x_mask, g, rng):
        """x [B,T,C_in], x_mask [B,T,1], g [B,T_sqz,C_g] → (z, m, logs, mask_sqz)."""
        for i, s in enumerate(self.strides):
            x = nn.Conv(
                self.hidden_channels, (s * 2,), strides=(s,),
                padding=((s // 2, s - s // 2),), name=f"pre_{i}",
            )(x)
        total = int(np.prod(self.strides))
        mask = x_mask[:, ::total][:, : x.shape[1]]
        x = x * mask
        x = WN(
            self.hidden_channels, self.kernel_size, 1, self.n_layers,
            self.gin_channels, name="wn",
        )(x, mask, g) * mask
        stats = nn.Conv(self.latent_channels * 2, (1,), name="out")(x)
        m, logs = jnp.split(stats, 2, axis=-1)
        z = m + jax.random.normal(rng, m.shape) * jnp.exp(logs)
        return z, m, logs, mask


class FVAEDecoder(nn.Module):
    hidden_channels: int
    out_channels: int
    kernel_size: int
    n_layers: int
    gin_channels: int = 0
    strides: tuple = (4,)

    @nn.compact
    def __call__(self, z, x_mask, g):
        x = z
        for i, s in enumerate(self.strides):
            x = nn.ConvTranspose(
                self.hidden_channels, (s,), strides=(s,), name=f"pre_{i}"
            )(x)
        x = x * x_mask
        x = WN(
            self.hidden_channels, self.kernel_size, 1, self.n_layers,
            self.gin_channels, name="wn",
        )(x, x_mask, g) * x_mask
        return nn.Conv(self.out_channels, (1,), name="out")(x)


def _normal_logprob(x, mean, logs):
    return -0.5 * (np.log(2 * np.pi) + 2 * logs + ((x - mean) ** 2) * jnp.exp(-2 * logs))


class FVAE(nn.Module):
    in_out_channels: int = 64
    hidden_channels: int = 256
    latent_size: int = 16
    kernel_size: int = 5
    enc_n_layers: int = 8
    dec_n_layers: int = 4
    gin_channels: int = 64
    strides: tuple = (4,)
    use_prior_glow: bool = True
    glow_hidden: int = 64
    glow_kernel_size: int = 3
    glow_n_blocks: int = 4
    sqz_prior: bool = False

    def setup(self):
        s = self.strides[0]
        self.g_pre_net = nn.Conv(
            self.gin_channels, (s * 2,), strides=(s,),
            padding=((s // 2, s - s // 2),),
        )
        self.encoder = FVAEEncoder(
            self.hidden_channels, self.latent_size, self.kernel_size,
            self.enc_n_layers, self.gin_channels, self.strides,
        )
        dec_in = self.hidden_channels if self.sqz_prior else self.latent_size
        self.decoder = FVAEDecoder(
            self.hidden_channels, self.in_out_channels, self.kernel_size,
            self.dec_n_layers, self.gin_channels, self.strides,
        )
        if self.use_prior_glow:
            self.prior_flow = ResidualCouplingBlock(
                self.latent_size, self.glow_hidden, self.glow_kernel_size,
                1, self.glow_n_blocks, 4, gin_channels=self.gin_channels,
            )
        if self.sqz_prior:
            self.query_proj = nn.Dense(self.latent_size)
            self.key_proj = nn.Dense(self.latent_size)
            self.value_proj = nn.Dense(self.hidden_channels)

    def _style_pool(self, z):
        """Attention pooling of the latent sequence to one style vector,
        broadcast back over time (``vae.py:213-222``)."""
        q = self.query_proj(jnp.mean(z, axis=1, keepdims=True))  # [B,1,L]
        k = self.key_proj(z)  # [B,T,L]
        v = self.value_proj(z)  # [B,T,H]
        attn = jax.nn.softmax(q @ k.transpose(0, 2, 1), axis=-1)  # [B,1,T]
        style = attn @ v  # [B,1,H]
        return jnp.broadcast_to(style, (z.shape[0], z.shape[1], v.shape[-1]))

    def __call__(self, x, x_mask, g, rng, infer: bool = False, temperature: float = 1.0):
        """x [B,T,C] (None at infer), x_mask [B,T], g [B,T,C_g].

        train → (x_recon, loss_kl, z_p, m_q, logs_q);
        infer → (x_recon, z_p).
        """
        mask3 = x_mask[..., None]
        g_sqz = self.g_pre_net(g)
        if not infer:
            rng_q, _ = jax.random.split(rng)
            z_q, m_q, logs_q, mask_sqz = self.encoder(x, mask3, g_sqz, rng_q)
            dec_in = self._style_pool(z_q) if self.sqz_prior else z_q
            x_recon = self.decoder(dec_in, mask3, g)
            if self.use_prior_glow:
                logqx = _normal_logprob(z_q, m_q, logs_q)
                z_p = self.prior_flow(z_q, mask_sqz, g=g_sqz, reverse=False)
                logpx = _normal_logprob(z_p, 0.0, jnp.zeros_like(z_p))
                loss_kl = (
                    jnp.sum((logqx - logpx) * mask_sqz)
                    / jnp.maximum(jnp.sum(mask_sqz), 1.0)
                    / self.latent_size
                )
            else:
                kl = -logs_q - 0.5 + 0.5 * (jnp.exp(2 * logs_q) + m_q**2)
                loss_kl = (
                    jnp.sum(kl * mask_sqz)
                    / jnp.maximum(jnp.sum(mask_sqz), 1.0)
                    / self.latent_size
                )
                z_p = z_q
            return x_recon, loss_kl, z_p, m_q, logs_q
        else:
            T_sqz = g_sqz.shape[1]
            z_p = (
                jax.random.normal(rng, (g.shape[0], T_sqz, self.latent_size))
                * temperature
            )
            ones = jnp.ones_like(z_p[..., :1])
            if self.use_prior_glow:
                z_p = self.prior_flow(z_p, ones, g=g_sqz, reverse=True)
            dec_in = self._style_pool(z_p) if self.sqz_prior else z_p
            x_recon = self.decoder(dec_in, mask3, g)
            return x_recon, z_p


def _downsample2(x):
    """2× nearest temporal downsample (``vae.py:300`` F.interpolate 0.5)."""
    return x[:, ::2]


class _CondConvEncoder(nn.Module):
    """HuBERT 1024 → 64 conv stack w/ BN+GELU (``vae.py:281-286``).
    Default ``norm='ln'``: BatchNorm replaced by LayerNorm (batch statistics
    are hostile to pjit-sharded batches; same normalization capability).
    ``norm='bn'`` keeps frozen running-stats BatchNorm — exact eval-mode
    reference semantics for imported torch checkpoints."""

    out_dim: int = 64
    norm: str = "ln"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (3,), padding="SAME", use_bias=False)(x)
        if self.norm == "bn":
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-5)(x)
        else:
            x = nn.LayerNorm()(x)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU default is exact erf
        return nn.Conv(self.out_dim, (3,), padding="SAME", use_bias=False)(x)


class VAEModel(nn.Module):
    """HuBERT → landmark-sequence VAE (``vae.py:273-340``)."""

    in_out_dim: int = 64
    sqz_prior: bool = False
    use_prior_flow: bool = True
    norm: str = "ln"

    def setup(self):
        self.mel_encoder = _CondConvEncoder(64, self.norm)
        self.vae = FVAE(
            in_out_channels=self.in_out_dim, hidden_channels=256, latent_size=16,
            kernel_size=5, enc_n_layers=8, dec_n_layers=4, gin_channels=64,
            strides=(4,), use_prior_glow=self.use_prior_flow, glow_hidden=64,
            glow_kernel_size=3, glow_n_blocks=4, sqz_prior=self.sqz_prior,
        )

    def cond_feats(self, batch):
        return self.mel_encoder(_downsample2(batch["hubert"]))

    def __call__(self, batch, rng, train: bool = True, temperature: float = 1.0):
        mask = batch["y_mask"]  # [B, T]
        cond = self.cond_feats(batch)
        if train:
            x_recon, loss_kl, z_p, m_q, logs_q = self.vae(
                batch["y"], mask, cond, rng, infer=False
            )
            x_recon = x_recon * mask[..., None]
            return {
                "pred": x_recon, "loss_kl": loss_kl, "mask": mask,
                "m_q": m_q, "z_p": z_p,
            }
        x_recon, z_p = self.vae(
            None, mask, cond, rng, infer=True, temperature=temperature
        )
        return {"pred": x_recon * mask[..., None], "mask": mask, "z_p": z_p}


class PitchContourVAEModel(nn.Module):
    """VAEModel + f0 pitch-contour conditioning (``vae.py:343-418``)."""

    in_out_dim: int = 64
    sqz_prior: bool = False
    use_prior_flow: bool = True
    norm: str = "ln"

    def setup(self):
        self.mel_encoder = _CondConvEncoder(64, self.norm)
        self.pitch_embed = nn.Embed(300, 64)
        self.pitch_encoder = _CondConvEncoder(32, self.norm)
        self.vae = FVAE(
            in_out_channels=self.in_out_dim, hidden_channels=256, latent_size=16,
            kernel_size=5, enc_n_layers=8, dec_n_layers=4, gin_channels=96,
            strides=(4,), use_prior_glow=self.use_prior_flow, glow_hidden=64,
            glow_kernel_size=3, glow_n_blocks=4, sqz_prior=self.sqz_prior,
        )

    def cond_feats(self, batch):
        mel = _downsample2(batch["hubert"])
        f0 = _downsample2(batch["f0"][..., None])[..., 0]
        pitch = self.pitch_embed(f0_to_coarse(f0))
        return jnp.concatenate(
            [self.mel_encoder(mel), self.pitch_encoder(pitch)], axis=-1
        )

    def __call__(self, batch, rng, train: bool = True, temperature: float = 1.0):
        mask = batch["y_mask"]
        cond = self.cond_feats(batch)
        if train:
            x_recon, loss_kl, z_p, m_q, logs_q = self.vae(
                batch["y"], mask, cond, rng, infer=False
            )
            return {
                "pred": x_recon * mask[..., None], "loss_kl": loss_kl,
                "mask": mask, "m_q": m_q, "z_p": z_p,
            }
        x_recon, z_p = self.vae(
            None, mask, cond, rng, infer=True, temperature=temperature
        )
        return {"pred": x_recon * mask[..., None], "mask": mask, "z_p": z_p}
