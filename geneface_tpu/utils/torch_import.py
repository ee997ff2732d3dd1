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
    "fvae_params_from_torch",
    "vae_model_params_from_torch",
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
    _p = params["params"] if "params" in params else params
    if isinstance(_p.get("pos_embeddings"), Mapping):
        raise ValueError(
            "cannot import torch grid embeddings into the fused grid layout "
            "— set grid_backend: 'reference' (or 'block') in the config for "
            "checkpoint import (docs/migrate_from_geneface.md)"
        )
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


# ------------------------------------------------------------ FVAE / VAE ----
def _wn_conv(sd: Mapping, key: str) -> np.ndarray:
    """Fold a weight-normed torch Conv1d (``torch.nn.utils.weight_norm``,
    ``flow_base.py:46-64``) into a plain flax kernel: per-output-channel
    ``w = g * v / ||v||`` over (in, k), then [out,in,k] → [k,in,out]."""
    v = np.asarray(sd[f"{key}.weight_v"], np.float64)
    gkey = f"{key}.weight_g"
    if gkey not in sd and f"{key}.weight" in sd:  # not weight-normed after all
        return _conv1d(sd, f"{key}.weight")
    g = np.asarray(sd[gkey], np.float64)
    norm = np.sqrt((v**2).sum(axis=(1, 2), keepdims=True))
    w = (g * v / np.maximum(norm, 1e-12)).astype(np.float32)
    return w.transpose(2, 1, 0)


def _convT1d(sd: Mapping, key: str) -> np.ndarray:
    """torch ConvTranspose1d weight [in, out, k] → flax [k, in, out]."""
    return np.asarray(sd[key]).transpose(2, 0, 1)


def _import_wn(sd, out, prefix_t, n_layers, has_cond=True):
    """torch ``WN`` (``flow_base.py:21-120``) → our ``WN`` submodule dict."""
    if has_cond and f"{prefix_t}.cond_layer.weight_v" in sd:
        _assign(out, ("cond_layer", "kernel"),
                _wn_conv(sd, f"{prefix_t}.cond_layer"),
                f"{prefix_t}.cond_layer.weight_v")
        _assign(out, ("cond_layer", "bias"),
                _arr(sd, f"{prefix_t}.cond_layer.bias"),
                f"{prefix_t}.cond_layer.bias")
    for i in range(n_layers):
        _assign(out, (f"in_{i}", "kernel"),
                _wn_conv(sd, f"{prefix_t}.in_layers.{i}"),
                f"{prefix_t}.in_layers.{i}.weight_v")
        _assign(out, (f"in_{i}", "bias"),
                _arr(sd, f"{prefix_t}.in_layers.{i}.bias"),
                f"{prefix_t}.in_layers.{i}.bias")
        _assign(out, (f"res_skip_{i}", "kernel"),
                _wn_conv(sd, f"{prefix_t}.res_skip_layers.{i}"),
                f"{prefix_t}.res_skip_layers.{i}.weight_v")
        _assign(out, (f"res_skip_{i}", "bias"),
                _arr(sd, f"{prefix_t}.res_skip_layers.{i}.bias"),
                f"{prefix_t}.res_skip_layers.{i}.bias")


def _wn_layers(sd, prefix_t):
    return len({
        k.split(".")[-2]
        for k in sd if k.startswith(f"{prefix_t}.in_layers.")
    })


def fvae_params_from_torch(sd: Mapping, params: dict, prefix_t: str = "") -> dict:
    """torch ``FVAE`` (``modules/audio2motion/vae.py:149-268``) → our FVAE
    params dict (mutated in place and returned; pass the ``'params'`` subtree
    of the template). ``prefix_t`` e.g. ``"vae."`` inside a VAEModel."""
    out = params

    def t(key):
        return f"{prefix_t}{key}"

    # g_pre_net: Sequential with one strided conv per stride
    _assign(out, ("g_pre_net", "kernel"), _conv1d(sd, t("g_pre_net.0.weight")),
            t("g_pre_net.0.weight"))
    _assign(out, ("g_pre_net", "bias"), _arr(sd, t("g_pre_net.0.bias")),
            t("g_pre_net.0.bias"))

    # encoder
    enc = out["encoder"]
    _assign(enc, ("pre_0", "kernel"), _conv1d(sd, t("encoder.pre_net.0.weight")),
            t("encoder.pre_net.0.weight"))
    _assign(enc, ("pre_0", "bias"), _arr(sd, t("encoder.pre_net.0.bias")),
            t("encoder.pre_net.0.bias"))
    _import_wn(sd, enc["wn"], t("encoder.wn"), _wn_layers(sd, t("encoder.wn")))
    _assign(enc, ("out", "kernel"), _conv1d(sd, t("encoder.out_proj.weight")),
            t("encoder.out_proj.weight"))
    _assign(enc, ("out", "bias"), _arr(sd, t("encoder.out_proj.bias")),
            t("encoder.out_proj.bias"))

    # decoder (ConvTranspose pre-net)
    dec = out["decoder"]
    _assign(dec, ("pre_0", "kernel"), _convT1d(sd, t("decoder.pre_net.0.weight")),
            t("decoder.pre_net.0.weight"))
    _assign(dec, ("pre_0", "bias"), _arr(sd, t("decoder.pre_net.0.bias")),
            t("decoder.pre_net.0.bias"))
    _import_wn(sd, dec["wn"], t("decoder.wn"), _wn_layers(sd, t("decoder.wn")))
    _assign(dec, ("out", "kernel"), _conv1d(sd, t("decoder.out_proj.weight")),
            t("decoder.out_proj.weight"))
    _assign(dec, ("out", "bias"), _arr(sd, t("decoder.out_proj.bias")),
            t("decoder.out_proj.bias"))

    # prior flow: torch flows.{2i} are the couplings (odd ones are Flips)
    if "prior_flow" in out:
        pf = out["prior_flow"]
        n_flows = sum(1 for k in pf if k.startswith("couplings_"))
        for i in range(n_flows):
            cp = pf[f"couplings_{i}"]
            fk = t(f"prior_flow.flows.{2 * i}")
            _assign(cp, ("pre", "kernel"), _conv1d(sd, f"{fk}.pre.weight"),
                    f"{fk}.pre.weight")
            _assign(cp, ("pre", "bias"), _arr(sd, f"{fk}.pre.bias"),
                    f"{fk}.pre.bias")
            _import_wn(sd, cp["enc"], f"{fk}.enc", _wn_layers(sd, f"{fk}.enc"))
            _assign(cp, ("Conv_0", "kernel"), _conv1d(sd, f"{fk}.post.weight"),
                    f"{fk}.post.weight")
            _assign(cp, ("Conv_0", "bias"), _arr(sd, f"{fk}.post.bias"),
                    f"{fk}.post.bias")

    # sqz_prior style attention
    for name in ("query_proj", "key_proj", "value_proj"):
        if name in out and t(f"{name}.weight") in sd:
            _assign(out, (name, "kernel"), _lin(sd, t(f"{name}.weight")),
                    t(f"{name}.weight"))
            _assign(out, (name, "bias"), _arr(sd, t(f"{name}.bias")),
                    t(f"{name}.bias"))
    return out


def _import_cond_conv_encoder(sd, params, stats, prefix_t, prefix_f):
    """torch mel/pitch encoder Sequential (conv-BN-GELU-conv, bias-free convs,
    ``vae.py:278-286``) → our ``_CondConvEncoder`` with ``norm='bn'``."""
    _assign(params, (prefix_f, "Conv_0", "kernel"),
            _conv1d(sd, f"{prefix_t}.0.weight"), f"{prefix_t}.0.weight")
    _assign(params, (prefix_f, "BatchNorm_0", "scale"),
            _arr(sd, f"{prefix_t}.1.weight"), f"{prefix_t}.1.weight")
    _assign(params, (prefix_f, "BatchNorm_0", "bias"),
            _arr(sd, f"{prefix_t}.1.bias"), f"{prefix_t}.1.bias")
    _assign(stats, (prefix_f, "BatchNorm_0", "mean"),
            _arr(sd, f"{prefix_t}.1.running_mean"), f"{prefix_t}.1.running_mean")
    _assign(stats, (prefix_f, "BatchNorm_0", "var"),
            _arr(sd, f"{prefix_t}.1.running_var"), f"{prefix_t}.1.running_var")
    _assign(params, (prefix_f, "Conv_1", "kernel"),
            _conv1d(sd, f"{prefix_t}.3.weight"), f"{prefix_t}.3.weight")


def vae_model_params_from_torch(sd: Mapping, variables) -> dict:
    """torch ``VAEModel`` / ``PitchContourVAEModel``
    (``modules/audio2motion/vae.py:271-418``) → Flax variables (model built
    with ``norm='bn'``)."""
    tree = _to_mutable(variables)
    if "batch_stats" not in tree:
        raise ValueError(f"variables have no batch_stats. {_BN_HINT}")
    params, stats = tree["params"], tree["batch_stats"]
    _import_cond_conv_encoder(sd, params, stats, "mel_encoder", "mel_encoder")
    if "pitch_encoder" in params and "pitch_encoder.0.weight" in sd:
        _import_cond_conv_encoder(
            sd, params, stats, "pitch_encoder", "pitch_encoder"
        )
        _assign(params, ("pitch_embed", "embedding"),
                _arr(sd, "pitch_embed.weight"), "pitch_embed.weight")
    fvae_params_from_torch(sd, params["vae"], prefix_t="vae.")
    return _finalize(tree)
