"""RAD-NeRF: audio/landmark-conditioned instant-ngp radiance field.

Flax re-design of ``modules/radnerfs/radnerf.py``: a 3-D multi-res grid
position encoder, an **ambient MLP** mapping (pos_feat, cond_feat) → 2-D
ambient coordinates (tanh) that index a second 2-D grid encoder, a sigma MLP
with ``trunc_exp`` density activation, and an SH-direction-conditioned color
MLP with per-frame individual codes (``radnerf.py:28-129``).

The module is *field-only*: occupancy-grid machinery and render orchestration
live in ``geneface_tpu.models.radnerf.renderer`` as pure functions, keeping
this module a stateless ``params -> (sigma, color, ambient)`` map that jits
and shards cleanly.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from geneface_tpu.models.radnerf.cond_encoder import MLP, AudioAttNet, AudioNet
from geneface_tpu.ops import (
    grid_encode,
    init_grid_embeddings,
    make_grid_meta,
    sh_encode,
    trunc_exp,
)
from geneface_tpu.ops.encoders import (
    block_grid_encode,
    build_block_tables,
    fast_grid_encode,
    make_block_grid_meta,
)
from geneface_tpu.ops.fused_grid import (
    fused_grid_encode,
    init_fused_embeddings,
    make_fused_grid_meta,
)

__all__ = ["RADNeRF", "COND_IN_DIMS"]

COND_IN_DIMS = {
    "esperanto": 44,
    "deepspeech": 29,
    "idexp_lm3d_normalized": 68 * 3,
}


class RADNeRF(nn.Module):
    """Config keys mirror ``egs/egs_bases/radnerf/base.yaml``."""

    cond_type: str = "idexp_lm3d_normalized"
    cond_out_dim: int = 64
    cond_win_size: int = 1
    smo_win_size: int = 5
    with_att: bool = True
    bound: float = 1.0
    grid_type: str = "tiledgrid"  # "tiledgrid" | "hashgrid"
    grid_interpolation_type: str = "linear"
    log2_hashmap_size: int = 16
    desired_resolution: int = 2048
    # TPU-tuned level geometry. Measured (tools/bench_scatter_w.py, v5e):
    # table gather ~1.7 ns/ROW and scatter-add ~6.5 ns/ROW, both independent
    # of row width 8..128 — index count, not bytes, is the cost. Fewer,
    # wider levels therefore divide the grid's gather/scatter cost at equal
    # parameter count and equal total feature width (instant-ngp tab. 2
    # shows L*C is what matters for quality). Reference geometry
    # (gridencoder defaults L=16, C=2) is available via config.
    grid_num_levels: int = 8
    grid_level_dim: int = 4
    num_layers_ambient: int = 3
    hidden_dim_ambient: int = 128
    ambient_out_dim: int = 2
    num_layers_sigma: int = 3
    hidden_dim_sigma: int = 128
    geo_feat_dim: int = 128
    num_layers_color: int = 2
    hidden_dim_color: int = 128
    individual_embedding_num: int = 13000
    individual_embedding_dim: int = 4
    sh_degree: int = 4
    # compute dtype for the field MLPs (params stay f32); bf16 feeds the
    # MXU at full rate and matches instant-ngp's half-precision fused MLPs
    dtype: Any = jnp.bfloat16
    # propagate d loss/d position through the position grid encoder; off by
    # default (training stops ray gradients; see _ambient_and_pos)
    pos_input_grad: bool = False
    # fold level 0 into the fused hash table too (1 gather + 1 scatter per
    # grid instead of 2 + 2) at the cost of level-0's exact dense
    # interpolation — see ops/fused_grid.make_fused_grid_meta
    fused_single_table: bool = False
    # fused-backend checkpoint-layout version: lane budget per fused row
    # decides the grouping and hence the parameter tree shapes. Keep at the
    # value a checkpoint was saved with (pre-round-2 layouts used 128).
    fused_row_lanes: int = 256
    #: split the N coarsest non-dense levels into their own (dense where
    #: they fit) tables — the grouped-coarse aliasing knob (round 5)
    fused_ungroup_coarse: int = 0
    #: chunk the ungrouped coarse levels in runs of this length (1 =
    #: singles). Runs of 2 cap the alias gap at one octave while halving
    #: the extra row-op bill of ``fused_ungroup_coarse``
    fused_coarse_run: int = 1
    #: ambient-grid override of ``fused_ungroup_coarse`` (-1 = follow it).
    #: The ambient coordinate is a learned latent, so its grouped-coarse
    #: aliasing may be tolerable where the positional grid's is not —
    #: ungrouping only the pos grid halves the extra scatter bill
    ambient_ungroup_coarse: int = -1
    #: "same" | "bf16": backward-only grid tensor dtype (gradient-side)
    grid_bwd_dtype: str = "same"
    # "f32" | "bf16": compute dtype of the fused encoder's wide tensors
    # (params + grad accumulators stay f32; see ops/fused_grid.py)
    grid_compute_dtype: str = "f32"
    # single-table the AMBIENT grid only: the ambient coordinate is a
    # learned 2-D latent, so its level-0 may tolerate hashed aliasing that
    # the positional level-0 (the scene's low-frequency anchor) cannot
    ambient_single_table: bool = False
    # "fused": grouped-row layout (ops/fused_grid.py) — level 0 exact dense,
    # remaining levels fused into <=128-lane rows; 3 gathers + 3 scatters per
    # grid instead of 8 + 8 (row ops are priced per index on TPU,
    # tools/bench_rowops.py). "block": one wide gather per level (measured
    # ~30x faster than "reference" on v5e; equal capacity, block-granular
    # aliasing on capped levels). "reference": exact gridencoder.cu
    # semantics (use for torch-checkpoint import / golden parity).
    grid_backend: str = "fused"

    def setup(self):
        gridtype = {"tiledgrid": "tiled", "hashgrid": "hash"}[self.grid_type]
        # equal parameter budget across geometries: reference L=16/C=2 uses
        # sum(min(2^h, side^D))*2 params; with level_dim C the hashmap cap is
        # scaled so capped levels hold the same bytes
        import math as _math

        cap = self.log2_hashmap_size - int(
            round(_math.log2(self.grid_level_dim / 2))
        )
        self.pos_grid_meta = make_grid_meta(
            input_dim=3,
            num_levels=self.grid_num_levels,
            level_dim=self.grid_level_dim,
            base_resolution=16,
            log2_hashmap_size=cap,
            desired_resolution=int(self.desired_resolution * self.bound),
            gridtype=gridtype,
            interpolation=self.grid_interpolation_type,
        )
        self.ambient_grid_meta = make_grid_meta(
            input_dim=self.ambient_out_dim,
            num_levels=self.grid_num_levels,
            level_dim=self.grid_level_dim,
            base_resolution=16,
            log2_hashmap_size=cap,
            desired_resolution=self.desired_resolution,
            gridtype=gridtype,
            interpolation=self.grid_interpolation_type,
        )
        self.pos_block_meta = make_block_grid_meta(self.pos_grid_meta)
        self.ambient_block_meta = make_block_grid_meta(self.ambient_grid_meta)
        self.pos_fused_meta = make_fused_grid_meta(
            self.pos_grid_meta,
            single_table=self.fused_single_table,
            row_lanes=self.fused_row_lanes,
            compute=self.grid_compute_dtype,
            ungroup_coarse=self.fused_ungroup_coarse,
            coarse_run=self.fused_coarse_run,
            bwd_compute=self.grid_bwd_dtype,
        )
        amb_ungroup = (
            self.fused_ungroup_coarse
            if self.ambient_ungroup_coarse < 0
            else self.ambient_ungroup_coarse
        )
        self.ambient_fused_meta = make_fused_grid_meta(
            self.ambient_grid_meta,
            single_table=self.fused_single_table or self.ambient_single_table,
            row_lanes=self.fused_row_lanes,
            compute=self.grid_compute_dtype,
            ungroup_coarse=amb_ungroup,
            coarse_run=self.fused_coarse_run,
            bwd_compute=self.grid_bwd_dtype,
        )
        self.pos_embeddings = self.param(
            "pos_embeddings", self._grid_init(self.pos_grid_meta, self.pos_fused_meta)
        )
        self.ambient_embeddings = self.param(
            "ambient_embeddings",
            self._grid_init(self.ambient_grid_meta, self.ambient_fused_meta),
        )
        self.cond_prenet = AudioNet(
            dim_aud=self.cond_out_dim, win_size=self.cond_win_size
        )
        if self.with_att:
            self.cond_att_net = AudioAttNet(
                in_out_dim=self.cond_out_dim, seq_len=self.smo_win_size
            )
        self.ambient_net = MLP(
            dim_out=self.ambient_out_dim,
            dim_hidden=self.hidden_dim_ambient,
            num_layers=self.num_layers_ambient,
            dtype=self.dtype,
            # per-coordinate width-1 heads: dense [M] columns instead of a
            # lane-padded [M, ambient_out_dim] logit tensor
            split_out=(1,) * self.ambient_out_dim,
        )
        self.sigma_net = MLP(
            dim_out=1 + self.geo_feat_dim,
            dim_hidden=self.hidden_dim_sigma,
            num_layers=self.num_layers_sigma,
            dtype=self.dtype,
            # (sigma, geo_feat) head split by kernel columns: avoids storing
            # the lane-padded [M, 129] output + its cotangent
            split_out=(1, self.geo_feat_dim),
        )
        self.color_net = MLP(
            dim_out=3,
            dim_hidden=self.hidden_dim_color,
            num_layers=self.num_layers_color,
            dtype=self.dtype,
        )
        if self.individual_embedding_dim > 0:
            self.individual_embeddings = self.param(
                "individual_embeddings",
                lambda rng: 0.1
                * jax.random.normal(
                    rng,
                    (self.individual_embedding_num, self.individual_embedding_dim),
                ),
            )

    def init_all(self, cond: jax.Array, position: jax.Array, direction: jax.Array):
        """Trace every submodule once so ``model.init`` creates all params."""
        cond_feat = self.cal_cond_feat(cond)
        ind = (
            self.individual_embeddings[0]
            if self.individual_embedding_dim > 0
            else None
        )
        return self(position, direction, cond_feat, ind)

    # -- condition path ------------------------------------------------------
    def cal_cond_feat(self, cond: jax.Array) -> jax.Array:
        """[B_smo, W, C_in] raw condition window → [1, cond_out_dim].

        With attention, B_smo = smo_win_size consecutive frames are reduced to
        one smoothed feature (``radnerf.py:61-71``).
        """
        feat = self.cond_prenet(cond)  # [B_smo, C_out]
        if self.with_att:
            feat = self.cond_att_net(feat)[None]  # [1, C_out]
        return feat

    def _grid_init(self, meta, fmeta):
        if self.grid_backend == "fused":
            return lambda rng: init_fused_embeddings(rng, fmeta)
        return lambda rng: init_grid_embeddings(rng, meta)

    # -- field queries -------------------------------------------------------
    def _encode_grid(self, x01, embeddings, meta, bmeta, fmeta, input_grad=True):
        if self.grid_backend == "fused":
            # grouped rows: 3 gathers + 3 scatters per grid (fused_grid.py)
            return fused_grid_encode(x01, embeddings, fmeta, input_grad)
        if self.grid_backend == "block":
            # custom VJP: per-level LOCAL-table scatters (XLA scatter cost
            # grows with table size; local tables are 4-25x smaller than the
            # concatenated fast table naive autodiff would scatter into)
            return fast_grid_encode(x01, embeddings, bmeta)
        return grid_encode(x01, embeddings, meta)

    def _ambient_and_pos(self, position, cond_feat):
        x01 = (position + self.bound) / (2 * self.bound)
        # position input-grads are skipped: the training renderer composites
        # in compact space with stop-gradiented rays, so d loss/d position is
        # structurally zero (and costs ~12 ms/step to compute at M=524k).
        # The ambient grid keeps its input grads — they drive the ambient MLP.
        pos_feat = self._encode_grid(
            x01, self.pos_embeddings, self.pos_grid_meta, self.pos_block_meta,
            self.pos_fused_meta, input_grad=self.pos_input_grad,
        )
        # cond_feat enters the split first-layer matmul as a [1, C] part —
        # its [M, C] broadcast is never materialized (see _SplitDense)
        logits = self.ambient_net([pos_feat, cond_feat.reshape(1, -1)])
        tanhs = [jnp.tanh(l.astype(jnp.float32)) for l in logits]  # [M] each
        if self.grid_backend == "fused":
            # feed the encoder dense [M] coordinate columns directly — the
            # [M, 2] pack (lane-padded to 128 on TPU) never exists on the
            # training path; ambient_pos is assembled only for the output
            amb01 = tuple((t + 1.0) / 2.0 for t in tanhs)
        else:
            amb01 = (jnp.stack(tanhs, axis=-1) + 1.0) / 2.0
        ambient_feat = self._encode_grid(
            amb01, self.ambient_embeddings, self.ambient_grid_meta,
            self.ambient_block_meta, self.ambient_fused_meta,
        )
        ambient_pos = jnp.stack(tanhs, axis=-1)  # in [-1, 1]
        return pos_feat, ambient_feat, ambient_pos

    def density(self, position: jax.Array, cond_feat: jax.Array) -> dict:
        """Density-only query used by occupancy updates (``radnerf.py:107-129``)."""
        pos_feat, ambient_feat, _ = self._ambient_and_pos(position, cond_feat)
        sig, geo_feat = self.sigma_net([pos_feat, ambient_feat])
        return {"sigma": trunc_exp(sig), "geo_feat": geo_feat}

    def __call__(
        self,
        position: jax.Array,  # [N, 3] in [-bound, bound]
        direction: jax.Array,  # [N, 3] normalized
        cond_feat: jax.Array,  # [1, cond_out_dim]
        individual_code: jax.Array | None,  # [ind_dim] or None
    ):
        pos_feat, ambient_feat, ambient_pos = self._ambient_and_pos(
            position, cond_feat
        )
        sig, geo_feat = self.sigma_net([pos_feat, ambient_feat])
        sigma = trunc_exp(sig)  # width-1 head comes back as a dense [M]

        dir_feat = sh_encode(direction, self.sh_degree)
        parts = [dir_feat, geo_feat]
        if individual_code is not None:
            parts.append(individual_code.reshape(1, -1))
        color = jax.nn.sigmoid(self.color_net(parts))
        return sigma, color, ambient_pos
