"""Convert an HF torch Wav2Vec2ForCTC checkpoint to the Flax encoder.

One-time conversion so esperanto ASR features
(``geneface_tpu.datagen.asr_features``) run without torch/transformers at
runtime — the established converter pattern (FAN / BiSeNet / Deep3DRecon /
LPIPS precedents). Reference consumer: ``data_util/extract_esperanto.py``.

Usage:
    python tools/convert_wav2vec2_torch.py \
        --model cpierse/wav2vec2-large-xlsr-53-esperanto \
        --out data/ckpt/wav2vec2_esperanto.pkl
(``--model`` accepts a local HF directory; zero-egress images must have the
checkpoint on disk already.)
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _lin(sd, key):
    return {
        "kernel": np.asarray(sd[f"{key}.weight"]).T,
        "bias": np.asarray(sd[f"{key}.bias"]),
    }


def _ln(sd, key):
    return {
        "scale": np.asarray(sd[f"{key}.weight"]),
        "bias": np.asarray(sd[f"{key}.bias"]),
    }


def convert_state_dict(sd: dict, cfg: dict) -> dict:
    """torch ``Wav2Vec2ForCTC.state_dict()`` (numpy-valued ok) → Flax params.

    ``cfg`` holds the :class:`geneface_tpu.datagen.wav2vec2.Wav2Vec2Config`
    fields. The pos-conv weight norm is composed into a plain kernel here
    (``weight = g * v / ||v||`` over (out, in) per kernel position).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    # Wav2Vec2ForCTC prefixes the encoder "wav2vec2."; HubertForCTC uses
    # "hubert."; bare HubertModel/Wav2Vec2Model state dicts are unprefixed.
    W = ""
    for cand in ("wav2vec2.", "hubert."):
        if any(k.startswith(cand) for k in sd):
            W = cand
            break
    p: dict = {}

    fe = {}
    for i in range(len(cfg["conv_dim"])):
        base = f"{W}feature_extractor.conv_layers.{i}"
        conv = {
            # torch conv1d (out, in, K) -> flax (K, in, out)
            "kernel": np.asarray(sd[f"{base}.conv.weight"]).transpose(2, 1, 0)
        }
        if f"{base}.conv.bias" in sd:
            conv["bias"] = np.asarray(sd[f"{base}.conv.bias"])
        fe[f"conv_{i}"] = conv
        if cfg.get("feat_extract_norm", "layer") == "layer":
            fe[f"ln_{i}"] = _ln(sd, f"{base}.layer_norm")
        elif i == 0:
            fe["gn_0"] = _ln(sd, f"{base}.layer_norm")
    p["feature_encoder"] = fe

    p["fp_layer_norm"] = _ln(sd, f"{W}feature_projection.layer_norm")
    p["fp_projection"] = _lin(sd, f"{W}feature_projection.projection")

    pc = f"{W}encoder.pos_conv_embed.conv"
    if f"{pc}.parametrizations.weight.original0" in sd:
        g = np.asarray(sd[f"{pc}.parametrizations.weight.original0"])
        v = np.asarray(sd[f"{pc}.parametrizations.weight.original1"])
    else:  # older torch spelling
        g = np.asarray(sd[f"{pc}.weight_g"])
        v = np.asarray(sd[f"{pc}.weight_v"])
    norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
    w = g * v / np.maximum(norm, 1e-12)  # (out, in/groups, K)
    p["pos_conv"] = {
        "kernel": w.transpose(2, 1, 0),
        "bias": np.asarray(sd[f"{pc}.bias"]),
    }

    for i in range(cfg["num_hidden_layers"]):
        base = f"{W}encoder.layers.{i}"
        p[f"layer_{i}"] = {
            "attention": {
                name: _lin(sd, f"{base}.attention.{name}")
                for name in ("q_proj", "k_proj", "v_proj", "out_proj")
            },
            "layer_norm": _ln(sd, f"{base}.layer_norm"),
            "final_layer_norm": _ln(sd, f"{base}.final_layer_norm"),
            "ff_intermediate": _lin(sd, f"{base}.feed_forward.intermediate_dense"),
            "ff_output": _lin(sd, f"{base}.feed_forward.output_dense"),
        }
    p["encoder_layer_norm"] = _ln(sd, f"{W}encoder.layer_norm")
    if cfg.get("vocab_size", 0) and "lm_head.weight" in sd:
        p["lm_head"] = _lin(sd, "lm_head")
    return {"params": p}


def convert_model(model, out_path: str) -> dict:
    """Live ``Wav2Vec2ForCTC`` → saved pickle {config, params}."""
    c = model.config
    cfg = dict(
        vocab_size=int(c.vocab_size),
        hidden_size=int(c.hidden_size),
        num_hidden_layers=int(c.num_hidden_layers),
        num_attention_heads=int(c.num_attention_heads),
        intermediate_size=int(c.intermediate_size),
        conv_dim=tuple(c.conv_dim),
        conv_stride=tuple(c.conv_stride),
        conv_kernel=tuple(c.conv_kernel),
        conv_bias=bool(c.conv_bias),
        num_conv_pos_embeddings=int(c.num_conv_pos_embeddings),
        num_conv_pos_embedding_groups=int(c.num_conv_pos_embedding_groups),
        do_stable_layer_norm=bool(c.do_stable_layer_norm),
        feat_extract_norm=str(c.feat_extract_norm),
        layer_norm_eps=float(c.layer_norm_eps),
    )
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    payload = {"config": cfg, "params": convert_state_dict(sd, cfg)}
    if out_path:
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        with open(out_path, "wb") as f:
            pickle.dump(payload, f)
        print(f"wrote {out_path}")
    return payload


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    help="HF id or local dir of Wav2Vec2ForCTC weights")
    ap.add_argument("--out", required=True)
    a = ap.parse_args()
    from transformers import AutoModelForCTC

    model = AutoModelForCTC.from_pretrained(a.model).eval()
    convert_model(model, a.out)


if __name__ == "__main__":
    main()
