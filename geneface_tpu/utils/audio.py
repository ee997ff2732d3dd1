"""Audio IO + features: 16 kHz loading, mel spectrogram, f0, HuBERT.

Capabilities of the reference's audio stack
(``data_gen/process_lrs3/process_audio_mel_f0.py``,
``process_audio_hubert.py``, ``inference/postnet/postnet_infer.py:122``):
wav → 16 kHz mono; 80-bin log-mel at hop 160 (100 fps, 2 frames per 25-fps
video frame); f0 via autocorrelation (librosa/parselmouth are not in this
image — implemented on scipy); HuBERT hidden states via the in-repo Flax
encoder on a converted checkpoint (``tools/convert_hubert_torch.py``,
golden-tested in ``tests/test_hubert.py``) with a transformers fallback
when only the HF cache is present (zero-egress environments without either
get ``None`` — callers must handle it).
"""

from __future__ import annotations

import os
import subprocess

import numpy as np

__all__ = [
    "load_wav16k",
    "save_wav16k_from_any",
    "melspectrogram",
    "extract_f0",
    "extract_hubert",
    "hubert_available",
]

SR = 16000
HOP = 160  # 100 audio-fps -> 2 per 25-fps video frame
WIN = 800
N_FFT = 1024
N_MELS = 80


def load_wav16k(path: str) -> np.ndarray:
    """Load any audio file as mono float32 at 16 kHz (scipy + polyphase
    resample; falls back to ffmpeg for non-wav containers)."""
    from scipy.io import wavfile
    from scipy.signal import resample_poly

    if not path.endswith(".wav"):
        return load_wav16k(save_wav16k_from_any(path))
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:
        data = data.mean(-1)
    if sr != SR:
        from math import gcd

        g = gcd(sr, SR)
        data = resample_poly(data, SR // g, sr // g).astype(np.float32)
    return data


def save_wav16k_from_any(path: str, out_path: str | None = None) -> str:
    """ffmpeg transcode to 16 kHz mono wav (``base_nerf_infer.py:309``)."""
    out_path = out_path or os.path.splitext(path)[0] + "_16k.wav"
    subprocess.run(
        ["ffmpeg", "-y", "-v", "quiet", "-i", path, "-ar", str(SR), "-ac", "1",
         out_path],
        check=True,
    )
    return out_path


def _mel_filterbank(sr=SR, n_fft=N_FFT, n_mels=N_MELS, fmin=55.0, fmax=7600.0):
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    freqs = mel_to_hz(mels)
    bins = np.floor((n_fft + 1) * freqs / sr).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1), np.float32)
    for i in range(n_mels):
        lo, mid, hi = bins[i], bins[i + 1], bins[i + 2]
        if mid > lo:
            fb[i, lo:mid] = (np.arange(lo, mid) - lo) / (mid - lo)
        if hi > mid:
            fb[i, mid:hi] = (hi - np.arange(mid, hi)) / (hi - mid)
    return fb


def melspectrogram(wav: np.ndarray, n_mels: int = N_MELS) -> np.ndarray:
    """[T_audio] → log-mel [T_frames, n_mels] at hop 160."""
    from scipy.signal import stft

    _, _, Z = stft(
        wav, fs=SR, nperseg=WIN, noverlap=WIN - HOP, nfft=N_FFT,
        boundary="zeros", padded=True,
    )
    mag = np.abs(Z)  # [F, T]
    mel = _mel_filterbank(n_mels=n_mels) @ mag
    return np.log10(np.maximum(mel, 1e-5)).T.astype(np.float32)


def extract_f0(wav: np.ndarray, fmin=80.0, fmax=600.0) -> np.ndarray:
    """Autocorrelation f0 per hop frame → [T_frames] Hz (0 = unvoiced)."""
    n_frames = 1 + len(wav) // HOP
    f0 = np.zeros(n_frames, np.float32)
    win = WIN
    lo = int(SR / fmax)
    hi = min(int(SR / fmin), win - 1)
    pad = np.pad(wav, (win // 2, win // 2))
    for i in range(n_frames):
        seg = pad[i * HOP : i * HOP + win]
        seg = seg - seg.mean()
        energy = float(np.dot(seg, seg))
        if energy < 1e-4:
            continue
        ac = np.correlate(seg, seg, "full")[win - 1 :]
        ac = ac / (ac[0] + 1e-9)
        region = ac[lo:hi]
        peak = int(np.argmax(region)) + lo
        if ac[peak] > 0.3:
            f0[i] = SR / peak
    return f0


def _hubert_flax_ckpt() -> str:
    """Converted Flax HuBERT checkpoint path (tools/convert_hubert_torch.py);
    empty string when absent."""
    path = os.environ.get("GF_HUBERT_CKPT", "data/ckpt/hubert.pkl")
    return path if os.path.exists(path) else ""


def hubert_available(model_name="facebook/hubert-large-ls960-ft") -> bool:
    if _hubert_flax_ckpt():
        return True
    try:
        from transformers import HubertModel  # noqa: F401

        import transformers

        # offline environments need the checkpoint cached locally
        from transformers.utils import cached_file

        cached_file(model_name, "config.json", local_files_only=True)
        return True
    except Exception:
        return False


def _extract_hubert_flax(wav: np.ndarray, ckpt: str) -> np.ndarray:
    """Self-contained path: the in-repo Flax encoder on a converted
    checkpoint (no torch/transformers at runtime)."""
    import jax.numpy as jnp

    from geneface_tpu.datagen.wav2vec2 import (
        Wav2Vec2CTC,
        load_wav2vec2_params,
    )

    cfg, params = load_wav2vec2_params(ckpt)
    model = Wav2Vec2CTC(cfg)
    # hubert-large ships do_normalize=True (Wav2Vec2FeatureExtractor)
    w = np.asarray(wav, np.float32)
    w = (w - w.mean()) / np.sqrt(w.var() + 1e-7)
    hidden = model.apply(params, jnp.asarray(w)[None])[0]
    return np.asarray(hidden, np.float32)


def extract_hubert(wav: np.ndarray, model_name="facebook/hubert-large-ls960-ft"):
    """[T_audio] → HuBERT hidden states [T_frames, 1024] (stride 320,
    repeated 2× to 100 fps as the reference binarizer). Prefers the
    converted in-repo Flax encoder (``GF_HUBERT_CKPT`` /
    ``data/ckpt/hubert.pkl``); falls back to a locally-cached transformers
    checkpoint; returns None when neither is available (zero-egress)."""
    ckpt = _hubert_flax_ckpt()
    if ckpt:
        hidden = _extract_hubert_flax(wav, ckpt)
        return np.repeat(hidden, 2, axis=0).astype(np.float32)  # ~100 fps
    if not hubert_available(model_name):
        return None
    import torch
    from transformers import HubertModel, Wav2Vec2Processor

    processor = Wav2Vec2Processor.from_pretrained(model_name, local_files_only=True)
    model = HubertModel.from_pretrained(model_name, local_files_only=True).eval()
    with torch.no_grad():
        inp = processor(wav, sampling_rate=SR, return_tensors="pt").input_values
        hidden = model(inp).last_hidden_state[0].numpy()  # [T/320, 1024]
    return np.repeat(hidden, 2, axis=0).astype(np.float32)  # ~100 fps
