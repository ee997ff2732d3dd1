"""Metrics/observability: TensorBoard + JSONL scalar logging.

Mirrors the reference's observability surface (SURVEY §5: SummaryWriter per
task with ``tr/``, ``val/`` tag routing, ``utils/commons/base_task.py:68-71,
140-151``) with a TPU-friendly twist: scalars are also appended to a JSONL
file so headless pod runs are greppable without TensorBoard.
"""

from __future__ import annotations

import json
import os
import time

__all__ = ["MetricsLogger"]


class MetricsLogger:
    def __init__(self, work_dir: str, use_tensorboard: bool = True):
        self.work_dir = work_dir
        os.makedirs(work_dir, exist_ok=True)
        self.jsonl_path = os.path.join(work_dir, "metrics.jsonl")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(work_dir, "tb"))
            except Exception:
                self._tb = None

    def log_scalars(self, scalars: dict, step: int, prefix: str = "") -> None:
        clean = {}
        for k, v in scalars.items():
            try:
                clean[f"{prefix}{k}"] = float(v)
            except (TypeError, ValueError):
                continue
        if self._tb is not None:
            for k, v in clean.items():
                self._tb.add_scalar(k, v, step)
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps({"step": step, "ts": time.time(), **clean}) + "\n")

    def log_image(self, tag: str, img, step: int) -> None:
        """``img``: HWC uint8 or float [0,1] numpy array. Written to
        TensorBoard (when available) AND as a PNG under
        ``work_dir/images/<tag>/step_<n>.png`` so headless runs keep a
        human-checkable artifact (reference logs val render figures to TB,
        ``tasks/radnerfs/radnerf.py:264-265``)."""
        import numpy as np

        arr = np.asarray(img)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0, 1) * 255).astype("uint8")
        if self._tb is not None:
            self._tb.add_image(tag, arr, step, dataformats="HWC")
        img_dir = os.path.join(self.work_dir, "images", tag.replace("/", "_"))
        os.makedirs(img_dir, exist_ok=True)
        try:
            from PIL import Image

            Image.fromarray(arr).save(
                os.path.join(img_dir, f"step_{step}.png")
            )
        except Exception:
            np.save(os.path.join(img_dir, f"step_{step}.npy"), arr)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
