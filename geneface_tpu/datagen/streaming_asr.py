"""Streaming ASR for live-driven talking heads.

Re-design of the reference's live-microphone ASR class
(``data_util/extract_esperanto.py:35-380``): 20 ms audio chunks stream
through a sliding (left + context + middle? no — left + context + right)
segment; each ``run_step`` forwards one segment through wav2vec2, keeps the
middle ``context`` logits (the strides absorb boundary effects), and feeds
a ring feature buffer from which ``get_next_feat`` yields the ``[8, C, 16]``
attention windows the NeRF side consumes per video frame.

TPU-native differences:

- the segment forward is ONE jitted fixed-shape call (the segment length is
  a compile-time constant — no per-step retrace), running the converted
  Flax wav2vec2 (``tools/convert_wav2vec2_torch.py``) with the
  transformers-torch path as fallback;
- audio sources are pluggable: a wav file, a numpy array, any iterator of
  320-sample chunks (how the tests drive it), or the live microphone
  (pyaudio, gated on availability exactly like the reference's import).
"""

from __future__ import annotations

import numpy as np

__all__ = ["StreamingASR"]

SR = 16000
CHUNK = SR // 50  # 320 samples = 20 ms


class StreamingASR:
    """Chunked streaming wav2vec2 features (reference ``ASR`` class).

    ``source``: wav path | np.ndarray waveform | iterator of [320] chunks |
    ``"live"`` (microphone via pyaudio). Latency ≈
    ``(context + stride_right) * 20 ms``.
    """

    def __init__(
        self,
        source,
        flax_ckpt: str | None = None,
        model_name: str | None = None,
        context_size: int = 12,
        stride_left: int = 4,
        stride_right: int = 4,
        audio_dim: int = 44,
        vocab: list[str] | None = None,
        save_feats: bool = False,
    ):
        self.context_size = context_size
        self.stride_left = stride_left
        self.stride_right = stride_right
        self.audio_dim = audio_dim
        self.vocab = vocab
        self.save_feats = save_feats
        self.terminated = False
        self.text = "[START]"
        self.all_logits: list[np.ndarray] = []

        # left-pad like the reference (zeros for the first segment's stride)
        self.frames: list[np.ndarray] = [
            np.zeros(CHUNK, np.float32)
        ] * stride_left

        self._iter = self._make_source(source)
        self._forward = self._make_forward(flax_ckpt, model_name)

        # ring feature buffer + attention-window state
        # (reference feat_queue/front/tail/att_feats, ``:99-112``)
        self.feat_buffer_size = 4
        self.feat_buffer_idx = 0
        self.feat_queue = np.zeros(
            (self.feat_buffer_size * context_size, audio_dim), np.float32
        )
        self.front = self.feat_buffer_size * context_size - 8
        self.tail = 8
        self.att_feats = [np.zeros((audio_dim, 16), np.float32)] * 4

    # ------------------------------------------------------------ source ----
    def _make_source(self, source):
        if isinstance(source, str) and source == "live":
            return self._mic_chunks()
        if isinstance(source, str):  # wav path
            from geneface_tpu.utils.audio import load_wav16k

            wav = np.asarray(load_wav16k(source), np.float32)
            return self._array_chunks(wav)
        if isinstance(source, np.ndarray):
            return self._array_chunks(source.astype(np.float32))
        return iter(source)  # any iterator of [320] chunks

    @staticmethod
    def _array_chunks(wav):
        for i in range(0, len(wav) - CHUNK + 1, CHUNK):
            yield wav[i : i + CHUNK]

    def _mic_chunks(self):  # pragma: no cover - needs audio hardware
        try:
            import pyaudio
        except ImportError as e:
            raise ImportError(
                "live streaming needs pyaudio (not shipped in the TPU "
                "image); pass a wav path / array / chunk iterator instead"
            ) from e
        audio = pyaudio.PyAudio()
        stream = audio.open(
            format=pyaudio.paInt16, channels=1, rate=SR, input=True,
            frames_per_buffer=CHUNK,
        )
        while not self.terminated:
            buf = stream.read(CHUNK, exception_on_overflow=False)
            yield np.frombuffer(buf, np.int16).astype(np.float32) / 32768.0
        stream.stop_stream()
        stream.close()

    # ----------------------------------------------------------- forward ----
    def _make_forward(self, flax_ckpt, model_name):
        import os

        flax_ckpt = flax_ckpt or os.environ.get("GF_W2V2_ESPERANTO", "")
        if flax_ckpt:
            import jax
            import jax.numpy as jnp

            from geneface_tpu.datagen.wav2vec2 import (
                Wav2Vec2CTC,
                load_wav2vec2_params,
            )

            cfg, params = load_wav2vec2_params(flax_ckpt)
            model = Wav2Vec2CTC(cfg)

            @jax.jit
            def fwd(x):  # [1, S] fixed-length segment, pre-normalized
                return model.apply(params, x)

            def forward(seg: np.ndarray) -> np.ndarray:
                seg = (seg - seg.mean()) / np.sqrt(seg.var() + 1e-7)
                return np.asarray(fwd(jnp.asarray(seg)[None]))[0]

            return forward

        # transformers fallback (reference path, needs the HF checkpoint)
        import torch
        from transformers import AutoModelForCTC, AutoProcessor

        name = model_name or "cpierse/wav2vec2-large-xlsr-53-esperanto"
        processor = AutoProcessor.from_pretrained(name)
        model = AutoModelForCTC.from_pretrained(name).eval()

        def forward(seg):
            with torch.no_grad():
                inputs = processor(
                    seg, sampling_rate=SR, return_tensors="pt", padding=True
                )
                return model(inputs.input_values).logits[0].numpy()

        return forward

    # -------------------------------------------------------------- step ----
    def run_step(self) -> bool:
        """Consume one 20 ms chunk; forward a segment when enough context
        accumulated. Returns False once the stream is exhausted and the
        final segment has been flushed (reference ``run_step``)."""
        if self.terminated:
            return False
        frame = next(self._iter, None)
        if frame is None:
            self.terminated = True
        else:
            self.frames.append(np.asarray(frame, np.float32))
            need = self.stride_left + self.context_size + self.stride_right
            if len(self.frames) < need:
                return True

        seg = np.concatenate(self.frames)
        if not self.terminated:
            self.frames = self.frames[-(self.stride_left + self.stride_right):]

        logits = self._forward(seg)[:, : self.audio_dim]  # [N-1, C]
        left = max(0, self.stride_left)
        right = logits.shape[0] - self.stride_right + 1
        if self.terminated:
            right = logits.shape[0]
        feats = logits[left:right]

        if self.save_feats:
            self.all_logits.append(feats)
        # ring write (constant memory, reference ``:216-221``)
        start = self.feat_buffer_idx * self.context_size
        end = min(start + feats.shape[0], self.feat_queue.shape[0])
        self.feat_queue[start:end] = feats[: end - start]
        self.feat_buffer_idx = (self.feat_buffer_idx + 1) % self.feat_buffer_size

        if self.vocab is not None:
            ids = feats.argmax(-1)
            # CTC greedy: collapse repeats, drop blanks (last vocab slot)
            out, prev = [], -1
            for t in ids:
                if t != prev and t < len(self.vocab) - 1:
                    out.append(self.vocab[t])
                prev = t
            if out:
                self.text += " " + "".join(out)
        return not self.terminated

    def get_next_feat(self) -> np.ndarray:
        """→ [8, C, 16] attention window stack for one video frame
        (reference ``get_next_feat``: stride-2 ring reads)."""
        Q = self.feat_queue.shape[0]
        while len(self.att_feats) < 8:
            if self.front < self.tail:
                feat = self.feat_queue[self.front : self.tail]
            else:
                feat = np.concatenate(
                    [self.feat_queue[self.front :], self.feat_queue[: self.tail]]
                )
            self.front = (self.front + 2) % Q
            self.tail = (self.tail + 2) % Q
            self.att_feats.append(feat.T)  # [C, 16]
        out = np.stack(self.att_feats)  # [8, C, 16]
        self.att_feats = self.att_feats[1:]
        return out

    def run(self, out_npy: str | None = None) -> np.ndarray | None:
        """Drain the source; with ``save_feats``, return (and optionally
        save) the ``[T25, 16, C]`` training windows — identical layout to
        ``extract_esperanto_features`` (reference ``:230-250`` unfold)."""
        while self.run_step():
            pass
        if not self.save_feats:
            return None
        from geneface_tpu.datagen.asr_features import logits_to_windows

        logits = (
            np.concatenate(self.all_logits)
            if self.all_logits
            else np.zeros((0, self.audio_dim), np.float32)
        )
        wins = logits_to_windows(logits)
        if out_npy:
            np.save(out_npy, wins)
        return wins
