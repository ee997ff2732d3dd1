"""Import pretrained GeneFace (PyTorch) checkpoints into geneface_tpu.

Migration path for users switching from the reference implementation: load a
``checkpoints/<exp>/model_ckpt_steps_*.ckpt`` file written by the reference
trainer (``utils/commons/trainer.py:460-473`` — payload
``{'state_dict': {'model': <state_dict>, ...}, 'optimizer_states': ...}``)
and convert the torch ``state_dict`` into this framework's Flax parameter
pytrees.

Layout conversions (torch → flax):
- ``nn.Linear.weight`` ``[out, in]`` → ``Dense.kernel`` ``[in, out]`` (transpose)
- ``nn.Conv1d.weight`` ``[out, in, k]`` → kernel ``[k, in, out]`` (2,1,0)
- grid-encoder ``embeddings`` ``[n_entries, C]`` → same layout (bit-identical;
  our ``make_grid_meta`` reproduces the per-level offsets of
  ``gridencoder/grid.py:118-131``)

The converters take the *target parameter template* (from ``model.init``) so
every assignment is shape-checked; a mismatch raises with the config keys to
fix (the reference grid geometry is ``grid_num_levels=16, grid_level_dim=2``
while this framework's TPU-tuned default is 8×4).

No torch import is required here: ``state_dict`` values may be numpy arrays
or anything ``np.asarray`` accepts. ``load_reference_checkpoint`` (which
reads the torch pickle format) imports torch lazily.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Mapping

import numpy as np

__all__ = [
    "load_reference_checkpoint",
    "radnerf_params_from_torch",
    "nerf_backbone_params_from_torch",
    "postnet_params_from_torch",
    "syncnet_params_from_torch",
    "occupancy_from_torch",
    "torso_density_grid_from_torch",
]


# ------------------------------------------------------------- loading ----
def load_reference_checkpoint(path: str, model_name: str = "model") -> dict:
    """Read a reference trainer checkpoint → ``{key: np.ndarray}``.

    ``path`` may be a ``.ckpt`` file or a reference work dir (the newest
    ``model_ckpt_steps_*.ckpt`` is picked, as ``ckpt_utils.get_last_checkpoint:7``).
    ``model_name`` selects the sub-module the reference saved per child
    (``trainer.py:471-473``); dotted prefixes (older flat format,
    ``ckpt_utils.load_ckpt:36-38``) are handled too.
    """
    import torch  # lazy: only needed to read the torch pickle format

    if os.path.isdir(path):
        ckpts = sorted(
            glob.glob(os.path.join(path, "model_ckpt_steps_*.ckpt")),
            key=lambda p: int(re.findall(r"steps_(\d+)", p)[0]),
        )
        if not ckpts:
            raise FileNotFoundError(f"no model_ckpt_steps_*.ckpt under {path}")
        path = ckpts[-1]
    payload = torch.load(path, map_location="cpu", weights_only=True)
    state = payload.get("state_dict", payload)
    if model_name in state and isinstance(state[model_name], dict):
        state = state[model_name]
    elif any("." in k for k in state):
        prefix = model_name + "."
        sub = {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}
        state = sub or state
    return {k: v.detach().cpu().numpy() for k, v in state.items()}


# ------------------------------------------------------------- helpers ----
def _lin(sd: Mapping, key: str) -> np.ndarray:
    """torch Linear weight → Dense kernel."""
    return np.asarray(sd[key]).T


def _conv1d(sd: Mapping, key: str) -> np.ndarray:
    """torch Conv1d weight [out, in, k] → flax kernel [k, in, out]."""
    return np.asarray(sd[key]).transpose(2, 1, 0)


def _arr(sd: Mapping, key: str) -> np.ndarray:
    return np.asarray(sd[key])


def _assign(tree: dict, path: tuple, value: np.ndarray, torch_key: str, hint=""):
    """Shape-checked write of ``value`` at ``tree[path...]``."""
    node = tree
    for p in path[:-1]:
        if p not in node:
            raise KeyError(
                f"target params have no '{'/'.join(path)}' "
                f"(for torch key '{torch_key}'). {hint}"
            )
        node = node[p]
    leaf = node.get(path[-1])
    if leaf is None:
        raise KeyError(
            f"target params have no '{'/'.join(path)}' "
            f"(for torch key '{torch_key}'). {hint}"
        )
    if tuple(leaf.shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {'/'.join(path)} (torch '{torch_key}'): "
            f"checkpoint {tuple(value.shape)} vs model {tuple(leaf.shape)}. {hint}"
        )
    node[path[-1]] = value.astype(np.asarray(leaf).dtype)


def _to_mutable(tree):
    if isinstance(tree, Mapping):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def _finalize(tree):
    """numpy leaves → jnp arrays (numpy operands break inside jit traces)."""
    import jax.numpy as jnp

    if isinstance(tree, dict):
        return {k: _finalize(v) for k, v in tree.items()}
    return jnp.asarray(tree)


_GRID_HINT = (
    "Reference checkpoints use the CUDA gridencoder geometry — set "
    "grid_num_levels: 16, grid_level_dim: 2 (and matching log2_hashmap_size/"
    "desired_resolution) in the config, and grid_backend: 'reference' for "
    "bit-exact hash-level semantics."
)


def _import_audionet(sd, out, prefix_t, prefix_f):
    for i, t_idx in enumerate((0, 2, 4, 6)):
        _assign(
            out, (prefix_f, f"Conv1dK3_{i}", "kernel"),
            _conv1d(sd, f"{prefix_t}.encoder_conv.{t_idx}.weight"),
            f"{prefix_t}.encoder_conv.{t_idx}.weight",
        )
        _assign(
            out, (prefix_f, f"Conv1dK3_{i}", "bias"),
            _arr(sd, f"{prefix_t}.encoder_conv.{t_idx}.bias"),
            f"{prefix_t}.encoder_conv.{t_idx}.bias",
        )
    for i, t_idx in enumerate((0, 2)):
        _assign(
            out, (prefix_f, f"Dense_{i}", "kernel"),
            _lin(sd, f"{prefix_t}.encoder_fc1.{t_idx}.weight"),
            f"{prefix_t}.encoder_fc1.{t_idx}.weight",
        )
        _assign(
            out, (prefix_f, f"Dense_{i}", "bias"),
            _arr(sd, f"{prefix_t}.encoder_fc1.{t_idx}.bias"),
            f"{prefix_t}.encoder_fc1.{t_idx}.bias",
        )


def _import_attnet(sd, out, prefix_t, prefix_f):
    for i, t_idx in enumerate((0, 2, 4, 6, 8)):
        _assign(
            out, (prefix_f, f"Conv1dK3_{i}", "kernel"),
            _conv1d(sd, f"{prefix_t}.attentionConvNet.{t_idx}.weight"),
            f"{prefix_t}.attentionConvNet.{t_idx}.weight",
        )
        _assign(
            out, (prefix_f, f"Conv1dK3_{i}", "bias"),
            _arr(sd, f"{prefix_t}.attentionConvNet.{t_idx}.bias"),
            f"{prefix_t}.attentionConvNet.{t_idx}.bias",
        )
    _assign(
        out, (prefix_f, "Dense_0", "kernel"),
        _lin(sd, f"{prefix_t}.attentionNet.0.weight"),
        f"{prefix_t}.attentionNet.0.weight",
    )
    _assign(
        out, (prefix_f, "Dense_0", "bias"),
        _arr(sd, f"{prefix_t}.attentionNet.0.bias"),
        f"{prefix_t}.attentionNet.0.bias",
    )


def _import_mlp(sd, out, prefix_t, prefix_f, n_layers):
    for i in range(n_layers):
        _assign(
            out, (prefix_f, f"Dense_{i}", "kernel"),
            _lin(sd, f"{prefix_t}.net.{i}.weight"),
            f"{prefix_t}.net.{i}.weight",
        )


# ------------------------------------------------------------- RADNeRF ----
def radnerf_params_from_torch(sd: Mapping, params) -> dict:
    """torch RADNeRF / RADNeRFTorso state_dict → Flax params pytree.

    ``params`` is the template from ``model.init(...)`` (shapes validated
    leaf-by-leaf). Handles the head model (``modules/radnerfs/radnerf.py``)
    and, when the template/state_dict carry them, the torso extras
    (``modules/radnerfs/radnerf_torso.py:17-50``).
    """
    tree = _to_mutable(params)
    out = tree["params"]

    _assign(out, ("pos_embeddings",), _arr(sd, "position_embedder.embeddings"),
            "position_embedder.embeddings", _GRID_HINT)
    _assign(out, ("ambient_embeddings",), _arr(sd, "ambient_embedder.embeddings"),
            "ambient_embedder.embeddings", _GRID_HINT)
    if "individual_embeddings" in sd and "individual_embeddings" in out:
        _assign(out, ("individual_embeddings",),
                _arr(sd, "individual_embeddings"), "individual_embeddings")

    _import_audionet(sd, out, "cond_prenet", "cond_prenet")
    if "cond_att_net.attentionNet.0.weight" in sd and "cond_att_net" in out:
        _import_attnet(sd, out, "cond_att_net", "cond_att_net")

    def n_dense(name):
        return sum(1 for k in out[name] if k.startswith("Dense_"))

    _import_mlp(sd, out, "ambient_net", "ambient_net", n_dense("ambient_net"))
    _import_mlp(sd, out, "sigma_net", "sigma_net", n_dense("sigma_net"))
    _import_mlp(sd, out, "color_net", "color_net", n_dense("color_net"))

    # ---- torso extras (present iff the ckpt is a RADNeRFTorso) ----
    if "torso_embedder.embeddings" in sd and "torso_embeddings" in out:
        _assign(out, ("torso_embeddings",), _arr(sd, "torso_embedder.embeddings"),
                "torso_embedder.embeddings", _GRID_HINT)
        if "torso_individual_codes" in sd and "torso_individual_codes" in out:
            _assign(out, ("torso_individual_codes",),
                    _arr(sd, "torso_individual_codes"), "torso_individual_codes")
        _import_mlp(sd, out, "torso_deform_net", "torso_deform_net",
                    n_dense("torso_deform_net"))
        # the reference spells it "canonicial"
        _import_mlp(sd, out, "torso_canonicial_net", "torso_canonical_net",
                    n_dense("torso_canonical_net"))
        if "head_color_weights_encoder.0.weight" in sd and "Dense_0" in out:
            for i, t_idx in enumerate((0, 2, 4)):
                _assign(out, (f"Dense_{i}", "kernel"),
                        _lin(sd, f"head_color_weights_encoder.{t_idx}.weight"),
                        f"head_color_weights_encoder.{t_idx}.weight")
                _assign(out, (f"Dense_{i}", "bias"),
                        _arr(sd, f"head_color_weights_encoder.{t_idx}.bias"),
                        f"head_color_weights_encoder.{t_idx}.bias")
    return _finalize(tree)


# --------------------------------------------------------- vanilla NeRF ----
def nerf_backbone_params_from_torch(sd: Mapping, params, prefix_t: str = "") -> dict:
    """torch ``NeRFBackbone`` (``modules/nerfs/adnerf/backbone.py:82-135``)
    → Flax ``geneface_tpu.models.nerf.NeRFBackbone`` params.

    Dense numbering: 0..D-1 density_linears, D density_out, D+1..D+C
    color_linears, D+C+1 color_out. ``prefix_t`` selects a sub-module of a
    larger state_dict (e.g. ``"model_coarse."``).
    """
    tree = _to_mutable(params)
    out = tree["params"]
    dd = [k for k in sd if k.startswith(f"{prefix_t}density_linears.")]
    n_density = len({k.split(".")[-2] for k in dd})
    cc = [k for k in sd if k.startswith(f"{prefix_t}color_linears.")]
    n_color = len({k.split(".")[-2] for k in cc})

    def put(i, t_key):
        _assign(out, (f"Dense_{i}", "kernel"), _lin(sd, f"{t_key}.weight"),
                f"{t_key}.weight")
        _assign(out, (f"Dense_{i}", "bias"), _arr(sd, f"{t_key}.bias"),
                f"{t_key}.bias")

    for i in range(n_density):
        put(i, f"{prefix_t}density_linears.{i}")
    put(n_density, f"{prefix_t}density_out_linear")
    for i in range(n_color):
        put(n_density + 1 + i, f"{prefix_t}color_linears.{i}")
    put(n_density + 1 + n_color, f"{prefix_t}color_out_linear")
    return _finalize(tree)


# ----------------------------------------------------------- occupancy ----
def occupancy_from_torch(sd: Mapping, grid_size: int, density_thresh: float):
    """Reference density-grid buffers → :class:`OccupancyState`.

    The reference stores ``density_grid [CAS*H^3]`` + packed
    ``density_bitfield`` (``renderer.py:90-93``); on TPU the bitfield is a
    bool grid recomputed from the density at ``min(mean_density, thresh)``
    (``renderer.py:255-260`` packbits semantics).
    """
    import jax.numpy as jnp

    from geneface_tpu.models.radnerf.renderer import OccupancyState

    dg = np.asarray(sd["density_grid"], np.float32).reshape(1, -1)[:, : grid_size**3]
    valid = dg >= 0  # -1 marks untrained cells (renderer.py:129-196)
    mean_density = float(dg[valid].mean()) if valid.any() else 0.0
    thresh = min(mean_density, density_thresh)
    occ = (dg > thresh).reshape(1, grid_size, grid_size, grid_size)
    return OccupancyState(
        density_grid=jnp.asarray(dg),
        occ_grid=jnp.asarray(occ),
        mean_density=jnp.asarray(mean_density, jnp.float32),
    )


def torso_density_grid_from_torch(sd: Mapping, grid_size: int) -> np.ndarray:
    """``density_grid_torso [H*H]`` buffer (``radnerf_torso.py:20-21``)."""
    return np.asarray(sd["density_grid_torso"], np.float32).reshape(
        grid_size, grid_size
    )


# ---------------------------------------------------- BN-block families ----
def _import_convbn(sd, params, stats, t_key, f_block, conv_name="Conv_0",
                   bn_name="BatchNorm_0"):
    """One reference ``Conv1d`` block (conv + BatchNorm1d,
    ``modules/postnet/models.py:8-18`` / ``modules/syncnet/models.py:6-20``)
    → our ConvBlock with ``norm='bn'`` (params + batch_stats)."""
    _assign(params, (f_block, conv_name, "kernel"),
            _conv1d(sd, f"{t_key}.conv_block.0.weight"),
            f"{t_key}.conv_block.0.weight")
    _assign(params, (f_block, conv_name, "bias"),
            _arr(sd, f"{t_key}.conv_block.0.bias"), f"{t_key}.conv_block.0.bias")
    _assign(params, (f_block, bn_name, "scale"),
            _arr(sd, f"{t_key}.conv_block.1.weight"),
            f"{t_key}.conv_block.1.weight")
    _assign(params, (f_block, bn_name, "bias"),
            _arr(sd, f"{t_key}.conv_block.1.bias"), f"{t_key}.conv_block.1.bias")
    _assign(stats, (f_block, bn_name, "mean"),
            _arr(sd, f"{t_key}.conv_block.1.running_mean"),
            f"{t_key}.conv_block.1.running_mean")
    _assign(stats, (f_block, bn_name, "var"),
            _arr(sd, f"{t_key}.conv_block.1.running_var"),
            f"{t_key}.conv_block.1.running_var")


_BN_HINT = "Build the model with norm='bn' to import reference checkpoints."


def postnet_params_from_torch(sd: Mapping, variables) -> dict:
    """torch ``CNNPostNet``/``PitchContourCNNPostNet``
    (``modules/postnet/models.py:20-75``) → Flax variables.

    ``variables`` must come from a model built with ``norm='bn'`` (so it has
    a ``batch_stats`` collection).
    """
    tree = _to_mutable(variables)
    if "batch_stats" not in tree:
        raise ValueError(f"variables have no batch_stats. {_BN_HINT}")
    core = "_RefinerCore_0"
    params = tree["params"][core]
    stats = tree["batch_stats"][core]
    blocks = (
        [(f"block1.{i}", f"_ConvBlock_{i}") for i in range(3)]
        + [(f"block2.{i}", f"_ConvBlock_{3 + i}") for i in range(3)]
        + [("block3.0", "_ConvBlock_6")]
    )
    for t_key, f_block in blocks:
        _import_convbn(
            sd, {f_block: params[f_block]}, {f_block: stats[f_block]},
            t_key, f_block,
        )
    _assign(params, ("Conv_0", "kernel"), _conv1d(sd, "block3.1.weight"),
            "block3.1.weight")
    _assign(params, ("Conv_0", "bias"), _arr(sd, "block3.1.bias"),
            "block3.1.bias")
    return _finalize(tree)


def syncnet_params_from_torch(sd: Mapping, variables) -> dict:
    """torch ``LandmarkHubertSyncNet`` (``modules/syncnet/models.py:22-79``)
    → Flax variables (model built with ``norm='bn'``).

    Flax block numbering: the audio tower is traced first → ConvBlock_0..12
    = ``hubert_encoder.0..12``, ConvBlock_13..25 = ``mouth_encoder.0..12``.
    """
    tree = _to_mutable(variables)
    if "batch_stats" not in tree:
        raise ValueError(f"variables have no batch_stats. {_BN_HINT}")
    params, stats = tree["params"], tree["batch_stats"]
    for i in range(13):
        _import_convbn(sd, params, stats, f"hubert_encoder.{i}", f"ConvBlock_{i}")
        _import_convbn(
            sd, params, stats, f"mouth_encoder.{i}", f"ConvBlock_{13 + i}"
        )
    return _finalize(tree)
