"""Flax wav2vec2 CTC encoder — self-contained esperanto ASR features.

Re-implementation of the HF ``Wav2Vec2ForCTC`` forward (the reference drives
``cpierse/wav2vec2-large-xlsr-53-esperanto`` through ``transformers``,
``data_util/extract_esperanto.py:35-142``) so task-2 audio features run
without torch/transformers at runtime: convert the released checkpoint once
with ``tools/convert_wav2vec2_torch.py`` and the JAX forward takes over.
Golden-tested layer-by-layer against a live torch ``Wav2Vec2ForCTC``
(``tests/test_wav2vec2.py``).

Covers the XLSR-53 architecture variant: ``feat_extract_norm="layer"``
(per-conv-layer LayerNorm) and ``do_stable_layer_norm=True`` (pre-LN
transformer with a single post-LN at the end). The group-norm/post-LN base
variant is supported too (``feat_extract_norm="group"``).

``vocab_size=0`` drops the CTC head and returns the encoder hidden states
— that is exactly torch ``HubertModel`` (the reference's HuBERT feature
extractor, ``data_gen/process_lrs3/process_audio_hubert.py``): HuBERT's
inference-time graph is the same conv feature encoder + projection +
pre-LN transformer; the wav2vec2 quantizer/masking it drops never runs at
inference. Convert with ``tools/convert_hubert_torch.py``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Wav2Vec2Config", "Wav2Vec2CTC", "load_wav2vec2_params"]


@dataclass(frozen=True)
class Wav2Vec2Config:
    vocab_size: int = 44
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    conv_dim: tuple = (512, 512, 512, 512, 512, 512, 512)
    conv_stride: tuple = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: tuple = (10, 3, 3, 3, 3, 2, 2)
    conv_bias: bool = True
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    do_stable_layer_norm: bool = True
    feat_extract_norm: str = "layer"  # "layer" | "group"
    layer_norm_eps: float = 1e-5


class _FeatureEncoder(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x):  # [B, S] raw waveform
        c = self.cfg
        h = x[:, :, None]  # [B, S, 1] channel-last
        for i, (dim, stride, kernel) in enumerate(
            zip(c.conv_dim, c.conv_stride, c.conv_kernel)
        ):
            h = nn.Conv(
                dim, (kernel,), strides=(stride,), padding="VALID",
                use_bias=c.conv_bias, name=f"conv_{i}",
            )(h)
            if c.feat_extract_norm == "layer":
                h = nn.LayerNorm(epsilon=c.layer_norm_eps, name=f"ln_{i}")(h)
            elif i == 0:  # "group": GroupNorm(groups=dim) on the first layer
                h = nn.GroupNorm(
                    num_groups=c.conv_dim[0], epsilon=c.layer_norm_eps,
                    name="gn_0",
                )(h)
            h = jax.nn.gelu(h, approximate=False)
        return h  # [B, T, conv_dim[-1]]


class _Attention(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, h):  # [B, T, H]
        c = self.cfg
        D = c.hidden_size
        nh = c.num_attention_heads
        hd = D // nh
        q = nn.Dense(D, name="q_proj")(h) * (hd**-0.5)
        k = nn.Dense(D, name="k_proj")(h)
        v = nn.Dense(D, name="v_proj")(h)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], nh, hd)

        attn = jnp.einsum("bqhd,bkhd->bhqk", split(q), split(k))
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, split(v))
        out = out.reshape(h.shape[0], h.shape[1], D)
        return nn.Dense(D, name="out_proj")(out)


class _EncoderLayer(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, h):
        c = self.cfg
        eps = c.layer_norm_eps
        if c.do_stable_layer_norm:  # pre-LN
            h = h + _Attention(c, name="attention")(
                nn.LayerNorm(epsilon=eps, name="layer_norm")(h)
            )
            ff_in = nn.LayerNorm(epsilon=eps, name="final_layer_norm")(h)
            ff = nn.Dense(c.intermediate_size, name="ff_intermediate")(ff_in)
            ff = jax.nn.gelu(ff, approximate=False)
            h = h + nn.Dense(c.hidden_size, name="ff_output")(ff)
        else:  # post-LN (base models)
            h = nn.LayerNorm(epsilon=eps, name="layer_norm")(
                h + _Attention(c, name="attention")(h)
            )
            ff = nn.Dense(c.intermediate_size, name="ff_intermediate")(h)
            ff = jax.nn.gelu(ff, approximate=False)
            h = nn.LayerNorm(epsilon=eps, name="final_layer_norm")(
                h + nn.Dense(c.hidden_size, name="ff_output")(ff)
            )
        return h


class Wav2Vec2CTC(nn.Module):
    cfg: Wav2Vec2Config = field(default_factory=Wav2Vec2Config)

    @nn.compact
    def __call__(self, wav):  # [B, S] float32 (pre-normalized waveform)
        c = self.cfg
        eps = c.layer_norm_eps
        h = _FeatureEncoder(c, name="feature_encoder")(wav)
        h = nn.LayerNorm(epsilon=eps, name="fp_layer_norm")(h)
        h = nn.Dense(c.hidden_size, name="fp_projection")(h)

        # grouped positional conv embedding, SAME-ish padding K//2 both
        # sides then drop the last step when K is even (HF num_pad_remove)
        K = c.num_conv_pos_embeddings
        pos = nn.Conv(
            c.hidden_size, (K,), padding=[(K // 2, K // 2)],
            feature_group_count=c.num_conv_pos_embedding_groups,
            name="pos_conv",
        )(h)
        if K % 2 == 0:
            pos = pos[:, :-1]
        h = h + jax.nn.gelu(pos, approximate=False)
        if not c.do_stable_layer_norm:
            h = nn.LayerNorm(epsilon=eps, name="encoder_layer_norm")(h)
        for i in range(c.num_hidden_layers):
            h = _EncoderLayer(c, name=f"layer_{i}")(h)
        if c.do_stable_layer_norm:
            h = nn.LayerNorm(epsilon=eps, name="encoder_layer_norm")(h)
        if c.vocab_size == 0:  # HubertModel: encoder hidden states
            return h  # [B, T, hidden]
        return nn.Dense(c.vocab_size, name="lm_head")(h)  # [B, T, vocab]


def normalize_waveform(wav: np.ndarray) -> np.ndarray:
    """HF ``Wav2Vec2FeatureExtractor`` zero-mean/unit-var normalization
    (``do_normalize=True`` for xlsr checkpoints)."""
    wav = np.asarray(wav, np.float32)
    return (wav - wav.mean()) / np.sqrt(wav.var() + 1e-7)


def load_wav2vec2_params(path: str) -> tuple[Wav2Vec2Config, dict]:
    """Read a converted checkpoint (``tools/convert_wav2vec2_torch.py``)."""
    import pickle

    with open(path, "rb") as f:
        payload = pickle.load(f)
    cfg = Wav2Vec2Config(**payload["config"])
    params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
    return cfg, params
