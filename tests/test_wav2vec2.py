"""Flax wav2vec2 CTC vs a live torch ``Wav2Vec2ForCTC`` (golden)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from geneface_tpu.datagen.wav2vec2 import Wav2Vec2Config, Wav2Vec2CTC  # noqa: E402
from tools.convert_wav2vec2_torch import convert_model  # noqa: E402


def _golden(hf_kwargs, atol):
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2ForCTC

    torch.manual_seed(0)
    hf = Wav2Vec2ForCTC(HFConfig(**hf_kwargs)).eval()
    payload = convert_model(hf, out_path="")
    cfg = Wav2Vec2Config(**payload["config"])
    model = Wav2Vec2CTC(cfg)
    wav = np.random.RandomState(1).randn(1, 4000).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(wav)).logits.numpy()
    ours = np.asarray(model.apply(payload["params"], jnp.asarray(wav)))
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    np.testing.assert_allclose(ours, ref, atol=atol)


def test_wav2vec2_stable_layernorm_golden():
    """XLSR-53 architecture variant (feat_extract_norm='layer',
    do_stable_layer_norm=True) — the esperanto checkpoint's shape
    (``data_util/extract_esperanto.py``)."""
    _golden(
        dict(
            vocab_size=44, hidden_size=64, num_hidden_layers=3,
            num_attention_heads=4, intermediate_size=128,
            conv_dim=(32, 32, 32), conv_stride=(5, 2, 2),
            conv_kernel=(10, 3, 3), conv_bias=True,
            num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
            do_stable_layer_norm=True, feat_extract_norm="layer",
        ),
        atol=2e-4,
    )


def test_wav2vec2_base_variant_golden():
    """Base architecture (group-norm first conv, post-LN encoder)."""
    _golden(
        dict(
            vocab_size=32, hidden_size=48, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=96,
            conv_dim=(24, 24), conv_stride=(5, 2), conv_kernel=(10, 3),
            conv_bias=False, num_conv_pos_embeddings=15,
            num_conv_pos_embedding_groups=3,
            do_stable_layer_norm=False, feat_extract_norm="group",
        ),
        atol=2e-4,
    )


def test_esperanto_flax_path(tmp_path):
    """extract_esperanto_features drives the converted Flax checkpoint when
    given one (no transformers at feature time)."""
    import pickle

    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2ForCTC

    from geneface_tpu.datagen.asr_features import extract_esperanto_features

    torch.manual_seed(1)
    hf = Wav2Vec2ForCTC(
        HFConfig(
            vocab_size=44, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            conv_dim=(32, 32, 32), conv_stride=(5, 2, 2),
            conv_kernel=(10, 3, 3), num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4,
            do_stable_layer_norm=True, feat_extract_norm="layer",
        )
    ).eval()
    ckpt = str(tmp_path / "w2v2.pkl")
    payload = convert_model(hf, ckpt)
    with open(ckpt, "rb") as f:
        assert pickle.load(f)["config"] == payload["config"]

    wav = np.random.RandomState(2).randn(16000).astype(np.float32)
    wins = extract_esperanto_features(wav, n_frames=20, flax_ckpt=ckpt)
    assert wins.shape == (20, 16, 44)
    assert np.all(np.isfinite(wins)) and wins.std() > 0


def test_streaming_asr(tmp_path):
    """StreamingASR (reference data_util/extract_esperanto.py:35-380): a
    chunk-iterator source streams through the jitted Flax wav2vec2, the
    ring buffer serves [8, C, 16] attention windows, and save_feats yields
    the same [T, 16, C] window layout as the offline extractor."""
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2ForCTC

    from geneface_tpu.datagen.streaming_asr import CHUNK, StreamingASR

    torch.manual_seed(3)
    hf = Wav2Vec2ForCTC(
        HFConfig(
            vocab_size=44, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=128,
            conv_dim=(32, 32, 32), conv_stride=(5, 2, 2),
            conv_kernel=(10, 3, 3), num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4,
            do_stable_layer_norm=True, feat_extract_norm="layer",
        )
    ).eval()
    ckpt = str(tmp_path / "w2v2s.pkl")
    convert_model(hf, ckpt)

    rng = np.random.RandomState(5)
    wav = (0.1 * np.sin(np.linspace(0, 300, SR := 16000))
           + 0.01 * rng.randn(SR)).astype(np.float32)

    asr = StreamingASR(wav, flax_ckpt=ckpt, context_size=6, stride_left=2,
                       stride_right=2, save_feats=True)
    out_npy = str(tmp_path / "stream.npy")
    wins = asr.run(out_npy=out_npy)
    assert asr.terminated
    assert wins.shape[1:] == (16, 44) and wins.shape[0] > 5
    assert np.all(np.isfinite(wins)) and wins.std() > 0
    assert np.load(out_npy).shape == wins.shape

    # per-frame attention windows for the live GUI path
    asr2 = StreamingASR(iter(np.split(wav[: CHUNK * 40], 40)),
                        flax_ckpt=ckpt, context_size=6, stride_left=2,
                        stride_right=2)
    for _ in range(20):
        asr2.run_step()
    att = asr2.get_next_feat()
    assert att.shape == (8, 44, 16)
    att2 = asr2.get_next_feat()
    assert att2.shape == (8, 44, 16)
    assert np.all(np.isfinite(att)) and np.all(np.isfinite(att2))
