"""Flax HuBERT encoder vs a live torch ``HubertModel`` (golden) + the
self-contained ``extract_hubert`` path.

Reference consumer: ``data_gen/process_lrs3/process_audio_hubert.py`` and
``inference/postnet/postnet_infer.py:122`` (hidden states repeated 2x to
100 fps)."""

import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from geneface_tpu.datagen.wav2vec2 import Wav2Vec2Config, Wav2Vec2CTC  # noqa: E402
from tools.convert_hubert_torch import convert_model  # noqa: E402

TINY = dict(
    vocab_size=32,  # unused by HubertModel (no head) but HubertConfig wants it
    hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
    intermediate_size=128, conv_dim=(32, 32, 32), conv_stride=(5, 2, 2),
    conv_kernel=(10, 3, 3), conv_bias=True, num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4, do_stable_layer_norm=True,
    feat_extract_norm="layer",
)


def _tiny_hubert():
    from transformers import HubertConfig, HubertModel

    torch.manual_seed(0)
    return HubertModel(HubertConfig(**TINY)).eval()


def test_hubert_hidden_state_golden():
    """hubert-large architecture shape (layer-norm convs, pre-LN encoder):
    converted Flax forward matches torch ``last_hidden_state``."""
    hf = _tiny_hubert()
    payload = convert_model(hf, out_path="")
    assert payload["config"]["vocab_size"] == 0
    model = Wav2Vec2CTC(Wav2Vec2Config(**payload["config"]))
    wav = np.random.RandomState(1).randn(1, 4000).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(wav)).last_hidden_state.numpy()
    ours = np.asarray(model.apply(payload["params"], jnp.asarray(wav)))
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_extract_hubert_flax_path(tmp_path, monkeypatch):
    """``extract_hubert`` prefers the converted checkpoint and matches the
    torch HubertModel on the same (normalized) waveform, repeated 2x."""
    hf = _tiny_hubert()
    ckpt = tmp_path / "hubert.pkl"
    convert_model(hf, out_path=str(ckpt))
    monkeypatch.setenv("GF_HUBERT_CKPT", str(ckpt))

    from geneface_tpu.utils import audio

    assert audio.hubert_available()
    wav = np.random.RandomState(2).randn(6000).astype(np.float32)
    ours = audio.extract_hubert(wav)

    w = (wav - wav.mean()) / np.sqrt(wav.var() + 1e-7)
    with torch.no_grad():
        ref = hf(torch.from_numpy(w[None])).last_hidden_state[0].numpy()
    ref = np.repeat(ref, 2, axis=0)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_extract_hubert_none_without_ckpt(monkeypatch, tmp_path):
    """Zero-egress with no converted checkpoint and no HF cache -> None."""
    monkeypatch.setenv("GF_HUBERT_CKPT", str(tmp_path / "missing.pkl"))
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")

    from geneface_tpu.utils import audio

    wav = np.zeros(4000, np.float32)
    out = audio.extract_hubert(wav, model_name="definitely/not-cached-model")
    assert out is None
