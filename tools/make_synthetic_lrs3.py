"""Synthetic LRS3-format binarized dataset for tests/benchmarks.

Produces ``train``/``val`` IndexedDataset stores with the reference binarizer
schema (``data_gen/process_lrs3/binarizer.py``): per-clip ``hubert``
[2T, 1024], ``mel`` [2T, 80], ``f0`` [2T], ``idexp_lm3d`` [T, 68, 3]. The
landmark sequences follow low-frequency sinusoids of the audio features so
there is real audio→motion structure to learn. Also writes a pose store for
audio2pose (``audio`` [T, 58], ``pose`` [T, 6]).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from geneface_tpu.utils.indexed_dataset import IndexedDatasetBuilder  # noqa: E402


def make_lrs3(out_dir, n_train=8, n_val=2, t_range=(24, 48), seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(out_dir, exist_ok=True)
    for prefix, n in [("train", n_train), ("val", n_val)]:
        b = IndexedDatasetBuilder(os.path.join(out_dir, prefix), header_size=1 << 20)
        for i in range(n):
            T = rng.randint(*t_range)
            phase = rng.rand() * 6.28
            t = np.arange(2 * T)
            drive = np.sin(0.3 * t + phase)[:, None]
            hubert = (drive * rng.randn(1, 1024) * 0.5
                      + rng.randn(2 * T, 1024) * 0.1).astype(np.float32)
            mel = (drive * rng.randn(1, 80) + rng.randn(2 * T, 80) * 0.1).astype(np.float32)
            f0 = (200 + 50 * drive[:, 0]).astype(np.float32)
            lm = (np.sin(0.3 * (t[::2] / 2) + phase)[:, None, None]
                  * rng.randn(1, 68, 3) * 0.3
                  + rng.randn(T, 68, 3) * 0.02).astype(np.float32)
            b.add_item(
                {"hubert": hubert, "mel": mel, "f0": f0, "idexp_lm3d": lm,
                 "item_id": f"{prefix}_{i}"},
                id=i,
            )
        b.finalize()
    return out_dir


def make_pose(out_dir, n_train=6, n_val=2, t_range=(120, 160), seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(out_dir, exist_ok=True)
    for prefix, n in [("train", n_train), ("val", n_val)]:
        b = IndexedDatasetBuilder(os.path.join(out_dir, prefix), header_size=1 << 20)
        for i in range(n):
            T = rng.randint(*t_range)
            t = np.arange(T)
            audio = (np.sin(0.2 * t)[:, None] * rng.randn(1, 58)
                     + rng.randn(T, 58) * 0.1).astype(np.float32)
            pose = np.stack(
                [0.1 * np.sin(0.05 * t + k) for k in range(6)], -1
            ).astype(np.float32)
            b.add_item({"audio": audio, "pose": pose}, id=i)
        b.finalize()
    return out_dir


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/binary/lrs3_synth")
    ap.add_argument("--pose_out", default="data/binary/pose_synth")
    args = ap.parse_args()
    print("wrote", make_lrs3(args.out))
    print("wrote", make_pose(args.pose_out))
