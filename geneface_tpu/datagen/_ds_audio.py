"""DeepSpeech frozen-graph input prep: MFCC + context windows.

Numpy re-derivation of ``conv_audio_to_deepspeech_input_vector``
(``data_util/deepspeech_features/deepspeech_features.py:191-260``): 26 MFCCs
over 32 ms windows at 20 ms stride, stacked with ±9 frames of context into the
[T, 494] input the TF1 graph expects.
"""

from __future__ import annotations

import numpy as np

__all__ = ["mfcc", "audio_to_mfcc_windows"]

SR = 16000


def _dct2(x: np.ndarray, n_out: int) -> np.ndarray:
    """Orthonormal DCT-II over the last axis (scipy-free)."""
    N = x.shape[-1]
    k = np.arange(n_out)[:, None]
    n = np.arange(N)[None, :]
    basis = np.cos(np.pi * k * (2 * n + 1) / (2 * N))  # [n_out, N]
    scale = np.sqrt(2.0 / N) * np.ones((n_out, 1))
    scale[0] *= np.sqrt(0.5)
    return x @ (basis * scale).T


def _mel_fbank(n_fft: int, n_mels: int, sr: int = SR) -> np.ndarray:
    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel2hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    pts = mel2hz(np.linspace(hz2mel(0), hz2mel(sr / 2), n_mels + 2))
    bins = np.floor((n_fft + 1) * pts / sr).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(1, n_mels + 1):
        l, c, r = bins[m - 1], bins[m], bins[m + 1]
        for k in range(l, c):
            if c > l:
                fb[m - 1, k] = (k - l) / (c - l)
        for k in range(c, r):
            if r > c:
                fb[m - 1, k] = (r - k) / (r - c)
    return fb


def mfcc(
    audio: np.ndarray,  # int16-range or [-1, 1] float mono @16k
    num_cepstrum: int = 26,
    win_s: float = 0.032,
    hop_s: float = 0.02,
    n_mels: int = 40,
) -> np.ndarray:
    """[T, num_cepstrum] MFCCs (python_speech_features-compatible layout)."""
    a = np.asarray(audio, np.float64)
    if a.dtype.kind == "f" and np.abs(a).max() <= 1.5:
        a = a * 32767.0
    win = int(SR * win_s)
    hop = int(SR * hop_s)
    n_fft = int(2 ** np.ceil(np.log2(win)))
    if len(a) < win:
        a = np.pad(a, (0, win - len(a)))
    T = 1 + (len(a) - win) // hop
    idx = np.arange(win)[None, :] + hop * np.arange(T)[:, None]
    frames = a[idx] * np.hamming(win)[None, :]
    spec = np.abs(np.fft.rfft(frames, n_fft)) ** 2 / n_fft
    mel = np.maximum(spec @ _mel_fbank(n_fft, n_mels).T, 1e-10)
    return _dct2(np.log(mel), num_cepstrum).astype(np.float32)


def audio_to_mfcc_windows(
    audio: np.ndarray, num_cepstrum: int = 26, num_context: int = 9
) -> tuple[np.ndarray, int]:
    """→ ([T, (2*ctx+1)*n_cep] context-stacked input, T)."""
    feats = mfcc(audio, num_cepstrum)
    T = feats.shape[0]
    pad = np.zeros((num_context, num_cepstrum), np.float32)
    padded = np.concatenate([pad, feats, pad], 0)
    rows = np.stack(
        [padded[t : t + 2 * num_context + 1].reshape(-1) for t in range(T)]
    )
    # DeepSpeech normalizes the full utterance input
    rows = (rows - rows.mean()) / max(rows.std(), 1e-8)
    return rows.astype(np.float32), T
