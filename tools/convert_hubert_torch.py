"""Convert an HF torch ``HubertModel`` checkpoint to the Flax encoder.

One-time conversion so HuBERT audio features (``geneface_tpu.utils.audio.
extract_hubert`` — the reference's ``data_gen/process_lrs3/
process_audio_hubert.py`` / ``inference/postnet/postnet_infer.py:122``
feature path) run without torch/transformers at runtime. HuBERT's
inference graph is the wav2vec2 encoder minus the CTC head, so the
converted payload drives :class:`geneface_tpu.datagen.wav2vec2.Wav2Vec2CTC`
with ``vocab_size=0`` (hidden-state output).

Usage:
    python tools/convert_hubert_torch.py \
        --model facebook/hubert-large-ls960-ft \
        --out data/ckpt/hubert.pkl
(``--model`` accepts a local HF directory; zero-egress images must have the
checkpoint on disk already.)
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.convert_wav2vec2_torch import convert_state_dict


def convert_model(model, out_path: str) -> dict:
    """Live ``HubertModel`` (or ``HubertForCTC``) → pickle {config, params}
    with ``vocab_size=0`` so the Flax forward returns hidden states."""
    c = model.config
    cfg = dict(
        vocab_size=0,
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
    ap.add_argument("--model", default="facebook/hubert-large-ls960-ft",
                    help="HF id or local dir of HubertModel weights")
    ap.add_argument("--out", required=True)
    a = ap.parse_args()
    from transformers import HubertModel

    model = HubertModel.from_pretrained(a.model).eval()
    convert_model(model, a.out)


if __name__ == "__main__":
    main()
