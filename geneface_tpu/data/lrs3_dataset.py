"""LRS3 sequence dataset: indexed-store access + size-bucketed batching.

Counterpart of ``tasks/audio2motion/dataset_utils/lrs3_dataset.py``: random
access into the binarized LRS3 ``IndexedDataset`` (mel / hubert / f0 /
idexp_lm3d per clip), size-sorted token bucketing (``batch_by_size:73-139``,
max_tokens default 60000) and pad-collate.

TPU adaptation: padded batch lengths are rounded up to a multiple of
``pad_multiple`` (default 32, ≥ the reference's ``x_multiply=8``) so the
jitted train step sees a small, bounded set of shapes instead of one shape
per batch.
"""

from __future__ import annotations

import os

import numpy as np

from geneface_tpu.utils.indexed_dataset import IndexedDataset

__all__ = ["LRS3SeqDataset", "batch_by_size", "collate_seq_batch"]


def batch_by_size(sizes, max_tokens=60000, max_sentences=512):
    """Size-sorted index bucketing (``lrs3_dataset.py:73-139``): returns a
    list of index lists; each batch costs ≤ max_tokens padded tokens."""
    indices = np.argsort(np.asarray(sizes), kind="mergesort")
    batches, batch, sample_len = [], [], 0
    for idx in indices:
        n = sizes[idx]
        if n == 0:
            continue
        if n > max_tokens:
            raise ValueError(f"sample {idx} has {n} tokens > max_tokens {max_tokens}")
        new_len = max(sample_len, n)
        if batch and (
            len(batch) >= max_sentences or (len(batch) + 1) * new_len > max_tokens
        ):
            batches.append(batch)
            batch, sample_len = [], 0
        batch.append(int(idx))
        sample_len = max(sample_len, n)
    if batch:
        batches.append(batch)
    return batches


def _pad_2d(arrs, max_len):
    out = np.zeros((len(arrs), max_len) + arrs[0].shape[1:], np.float32)
    for i, a in enumerate(arrs):
        out[i, : len(a)] = a
    return out


def collate_seq_batch(items, pad_multiple: int = 32):
    """Pad a list of per-clip dicts into one batch; audio is 2× the motion
    length (HuBERT stride 320 @16k vs 25 fps landmarks)."""
    y_len = max(len(it["idexp_lm3d"]) for it in items)
    y_len = int(np.ceil(y_len / pad_multiple) * pad_multiple)
    x_len = 2 * y_len
    batch = {
        "hubert": _pad_2d([it["hubert"][: 2 * len(it["idexp_lm3d"])] for it in items], x_len),
        "mel": _pad_2d([it["mel"] for it in items], x_len)
        if "mel" in items[0]
        else None,
        "y": _pad_2d([it["idexp_lm3d"] for it in items], y_len),
        "mouth_lm3d": _pad_2d([it["mouth_idexp_lm3d"] for it in items], y_len),
        "item_names": [it.get("item_name", "") for it in items],
    }
    if batch["mel"] is None:
        del batch["mel"]
    if "f0" in items[0]:
        batch["f0"] = _pad_2d([it["f0"][:, None] for it in items], x_len)[..., 0]
    batch["y_mask"] = (np.abs(batch["y"]).sum(-1) > 0).astype(np.float32)
    return batch


class LRS3SeqDataset:
    def __init__(self, prefix: str, data_dir: str, max_tokens: int = 60000,
                 pad_multiple: int = 32):
        self.prefix = prefix
        self.ds = IndexedDataset(os.path.join(data_dir, prefix))
        self.pad_multiple = pad_multiple
        sizes_path = os.path.join(data_dir, f"sizes_{prefix}.npy")
        if os.path.exists(sizes_path):
            self.sizes = list(np.load(sizes_path))
        else:
            self.sizes = []
            for item in self.ds:
                self.sizes.append(0 if item is None else item["mel"].shape[0]
                                  if "mel" in item else len(item["hubert"]))
            np.save(sizes_path, self.sizes)
        self.batches = batch_by_size(self.sizes, max_tokens=max_tokens)

    def __len__(self):
        return len(self.ds)

    def item(self, idx: int) -> dict:
        raw = self.ds[idx]
        t = len(raw["idexp_lm3d"])
        lm = np.asarray(raw["idexp_lm3d"], np.float32).reshape(t, 68, 3)
        item = {
            "hubert": np.asarray(raw["hubert"], np.float32),
            "idexp_lm3d": lm.reshape(t, 204),
            "mouth_idexp_lm3d": lm[:, 48:68].reshape(t, 60),
            "item_name": raw.get("item_id", str(idx)),
        }
        if "mel" in raw:
            item["mel"] = np.asarray(raw["mel"], np.float32)
        if "f0" in raw:
            item["f0"] = np.asarray(raw["f0"], np.float32)
        return item

    def iter_batches(self, shuffle: bool = True, seed: int = 0, infinite: bool = True):
        rng = np.random.RandomState(seed)
        while True:
            order = np.arange(len(self.batches))
            if shuffle:
                rng.shuffle(order)
            for bi in order:
                items = [self.item(i) for i in self.batches[bi]]
                yield collate_seq_batch(items, self.pad_multiple)
            if not infinite:
                break
