"""RAD-NeRF torso: 2-D deformation-field renderer composited under the head.

Flax re-design of ``modules/radnerfs/radnerf_torso.py``: pose (6-D, freq×4)
+ screen-space bg coords (freq×10) + torso individual code [+ optional
head-aware encoding of the rendered head RGB/alpha] → deform MLP Δxy →
tiled 2-D grid encode at the deformed coordinate → canonical MLP →
(alpha, RGB). A 2-D density grid accelerates full-frame rendering via
bilinear occupancy masking (``radnerf_torso.py:161-177, 200-241``).

TPU adaptation: the torso field is evaluated on *all* rays with the occupancy
mask applied multiplicatively (no boolean compaction; static shapes), and the
head render underneath runs under ``stop_gradient`` exactly like the
reference's ``torch.no_grad`` head pass (``radnerf_torso.py:86-100``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from geneface_tpu.models.radnerf.cond_encoder import MLP
from geneface_tpu.models.radnerf.radnerf import RADNeRF
from geneface_tpu.ops import freq_encode, init_grid_embeddings, make_grid_meta
from geneface_tpu.ops.encoders import make_block_grid_meta
from geneface_tpu.ops.fused_grid import make_fused_grid_meta

__all__ = ["RADNeRFTorso", "sample_torso_occupancy"]


class RADNeRFTorso(RADNeRF):
    torso_shrink: float = 0.8
    torso_individual_embedding_dim: int = 8
    torso_head_aware: bool = False

    def setup(self):
        super().setup()
        import math as _math

        self.torso_grid_meta = make_grid_meta(
            input_dim=2,
            num_levels=self.grid_num_levels,
            level_dim=self.grid_level_dim,
            base_resolution=16,
            log2_hashmap_size=16
            - int(round(_math.log2(self.grid_level_dim / 2))),
            desired_resolution=2048,
            gridtype="tiled",
        )
        self.torso_block_meta = make_block_grid_meta(self.torso_grid_meta)
        self.torso_fused_meta = make_fused_grid_meta(
            self.torso_grid_meta,
            row_lanes=self.fused_row_lanes,
            compute=self.grid_compute_dtype,
        )
        self.torso_embeddings = self.param(
            "torso_embeddings",
            self._grid_init(self.torso_grid_meta, self.torso_fused_meta),
        )
        if self.torso_individual_embedding_dim > 0:
            self.torso_individual_codes = self.param(
                "torso_individual_codes",
                lambda rng: 0.1
                * jax.random.normal(
                    rng,
                    (
                        self.individual_embedding_num,
                        self.torso_individual_embedding_dim,
                    ),
                ),
            )
        if self.torso_head_aware:
            self.head_aware_mlps = [nn.Dense(16), nn.Dense(32), nn.Dense(16)]
        self.torso_deform_net = MLP(dim_out=2, dim_hidden=64, num_layers=3)
        self.torso_canonical_net = MLP(dim_out=4, dim_hidden=32, num_layers=3)

    def init_all(self, cond, position, direction):  # noqa: D102
        out = super().init_all(cond, position, direction)
        ind = (
            self.torso_individual_codes[0]
            if self.torso_individual_embedding_dim > 0
            else None
        )
        xy = jnp.zeros((position.shape[0], 2), position.dtype)
        self.forward_torso(xy, jnp.zeros((1, 6)), ind)
        return out

    def forward_torso(
        self,
        x: jax.Array,  # [N, 2] screen coords in [-1, 1]
        pose6: jax.Array,  # [1, 6] euler+trans head pose
        ind_code: jax.Array | None,  # [torso_ind_dim]
        head_image: jax.Array | None = None,  # [N, 3]
        head_weights_sum: jax.Array | None = None,  # [N, 1]
    ):
        """→ (alpha [N,1], color [N,3], deform Δxy [N,2]);
        mirrors ``radnerf_torso.py:51-84``."""
        N = x.shape[0]
        x = x * self.torso_shrink
        enc_pose = freq_encode(pose6, degree=4)  # [1, 54]
        enc_x = freq_encode(x, degree=10)  # [N, 42]
        parts = [enc_x, jnp.broadcast_to(enc_pose, (N, enc_pose.shape[-1]))]
        if ind_code is not None:
            parts.append(
                jnp.broadcast_to(ind_code.reshape(1, -1), (N, ind_code.shape[-1]))
            )
        h = jnp.concatenate(parts, axis=-1)
        if self.torso_head_aware:
            if head_image is None:
                head_image = jnp.zeros((N, 3), h.dtype)
                head_weights_sum = jnp.zeros((N, 1), h.dtype)
            ha = jnp.concatenate([head_image, head_weights_sum], axis=-1)
            for i, layer in enumerate(self.head_aware_mlps):
                ha = layer(ha)
                if i < len(self.head_aware_mlps) - 1:
                    ha = nn.leaky_relu(ha, negative_slope=0.02)
            h = jnp.concatenate([h, ha], axis=-1)
        dx = self.torso_deform_net(h)
        x_def = jnp.clip(x + dx, -1.0, 1.0)
        grid_feat = self._encode_grid(
            (x_def + 1.0) / 2.0, self.torso_embeddings, self.torso_grid_meta,
            self.torso_block_meta, self.torso_fused_meta,
        )
        h = self.torso_canonical_net(jnp.concatenate([grid_feat, h], axis=-1))
        alpha = jax.nn.sigmoid(h[..., :1])
        color = jax.nn.sigmoid(h[..., 1:])
        return alpha, color, dx


def sample_torso_occupancy(
    density_grid_torso: jax.Array,  # [H*H] (row = y, col = x; see note)
    coords: jax.Array,  # [N, 2] in [-1, 1], (x, y)
    grid_size: int,
) -> jax.Array:
    """Bilinear sample of the 2-D torso occupancy grid at screen coords,
    align-corners convention (``radnerf_torso.py:169-171``: grid stored with
    xy transposed so ``grid[y, x]``)."""
    H = grid_size
    g = density_grid_torso.reshape(H, H)  # [y, x]
    fx = (coords[:, 0] + 1.0) * 0.5 * (H - 1)
    fy = (coords[:, 1] + 1.0) * 0.5 * (H - 1)
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, H - 2)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, H - 2)
    wx = fx - x0
    wy = fy - y0
    v00 = g[y0, x0]
    v01 = g[y0, x0 + 1]
    v10 = g[y0 + 1, x0]
    v11 = g[y0 + 1, x0 + 1]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )
