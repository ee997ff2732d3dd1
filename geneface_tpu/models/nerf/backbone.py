"""Vanilla NeRF backbone: 8-layer density MLP with skip + color branch.

Flax re-implementation of ``modules/nerfs/adnerf/backbone.py:82-135``
(``NeRFBackbone``): condition features concatenated with the positional
encoding at the input, raw-input skip connection after layer
``skip_layer_indices``, and a half-width color branch fed by view encoding.
Conditioning encoders (AudioNet/AudioAttNet) are shared with the RAD-NeRF
family (``geneface_tpu.models.radnerf.cond_encoder``) — the reference
duplicates them per family (``backbone.py:6-80``,
``lm3d_nerf/cond_encoder.py``); here one implementation serves both.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["NeRFBackbone"]


class NeRFBackbone(nn.Module):
    hid_dim: int = 128
    num_density_linears: int = 8
    num_color_linears: int = 3
    skip_layer_indices: Sequence[int] = (4,)

    @nn.compact
    def __call__(
        self,
        pos_embed: jax.Array,  # [N, S, pos_dim] encoded positions
        cond: jax.Array,  # [cond_dim] or [N, cond_dim]
        view_embed: jax.Array,  # [N, view_dim] encoded view dirs
    ) -> jax.Array:
        """→ rgb+sigma logits [N, S, 4]."""
        N, S, _ = pos_embed.shape
        if cond.ndim == 1:
            cond_b = jnp.broadcast_to(cond[None, None, :], (N, S, cond.shape[-1]))
        else:
            cond_b = jnp.broadcast_to(cond[:, None, :], (N, S, cond.shape[-1]))
        view_b = jnp.broadcast_to(
            view_embed[:, None, :], (N, S, view_embed.shape[-1])
        )

        inp = jnp.concatenate([pos_embed, cond_b], axis=-1)
        h = inp
        for i in range(self.num_density_linears):
            h = nn.relu(nn.Dense(self.hid_dim)(h))
            if i in self.skip_layer_indices:
                h = jnp.concatenate([inp, h], axis=-1)
        sigma = nn.Dense(1)(h)

        h = jnp.concatenate([h, view_b], axis=-1)
        for _ in range(self.num_color_linears):
            h = nn.relu(nn.Dense(self.hid_dim // 2)(h))
        rgb = nn.Dense(3)(h)
        return jnp.concatenate([rgb, sigma], axis=-1)
