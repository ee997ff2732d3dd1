"""Checkpoint IO for pytree train states.

Capabilities mirrored from the reference (``utils/commons/ckpt_utils.py:7-66``
and ``utils/commons/trainer.py:434-473``): step-stamped checkpoint files,
latest/all lookup by step, atomic writes (tmp + ``os.replace``), keep-N
pruning, a separate best-val checkpoint, and *partial* loading of a
sub-module's parameters into another model (used e.g. when the torso task
warm-starts from a head checkpoint, ``tasks/radnerfs/radnerf_torso.py:30-47``).

Storage format: a single ``.ckpt`` file containing a pickled dict of
numpy-ified pytree leaves plus JSON-able metadata. This is framework-neutral
(no flax/orbax schema lock-in), supports partial/shape-pruned restores, and is
safe to load on hosts with no accelerator.
"""

from __future__ import annotations

import glob
import os
import pickle
import re
from typing import Any

import jax
import numpy as np

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "get_last_checkpoint",
    "get_all_checkpoints",
    "CheckpointManager",
    "restore_partial",
]

_STEP_RE = re.compile(r"model_ckpt_steps_(\d+)\.ckpt$")


def _to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, payload: dict) -> None:
    """Atomically pickle ``payload`` (pytrees are converted to numpy)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".part"
    with open(tmp, "wb") as f:
        pickle.dump(_to_numpy(payload), f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def get_all_checkpoints(work_dir: str) -> list[tuple[int, str]]:
    """All ``model_ckpt_steps_*.ckpt`` under ``work_dir``, sorted by step."""
    out = []
    for p in glob.glob(os.path.join(work_dir, "model_ckpt_steps_*.ckpt")):
        m = _STEP_RE.search(p)
        if m:
            out.append((int(m.group(1)), p))
    return sorted(out)


def get_last_checkpoint(work_dir: str) -> str | None:
    ckpts = get_all_checkpoints(work_dir)
    return ckpts[-1][1] if ckpts else None


def restore_partial(
    target: dict,
    source: dict,
    prefix: str = "",
    strict: bool = False,
    silent: bool = False,
) -> dict:
    """Copy leaves from a flat-or-nested ``source`` dict into ``target``.

    - ``prefix`` selects a dotted sub-tree of ``source`` (e.g. ``"model.head"``).
    - Shape-mismatched leaves are skipped unless ``strict`` (mirrors the
      reference's non-strict pruning load, ``ckpt_utils.py:40-62``).
    Returns a new nested dict; ``target`` is not mutated.
    """
    node = source
    if prefix:
        for part in prefix.split("."):
            node = node[part]

    def merge(dst: Any, src: Any, path: str) -> Any:
        if isinstance(dst, dict):
            if not isinstance(src, dict):
                if strict:
                    raise ValueError(f"{path}: expected dict, got {type(src)}")
                return dst
            out = {}
            for k, v in dst.items():
                if k in src:
                    out[k] = merge(v, src[k], f"{path}.{k}" if path else k)
                else:
                    if strict:
                        raise KeyError(f"missing key {path}.{k} in checkpoint")
                    out[k] = v
            return out
        src_arr = np.asarray(src)
        dst_shape = getattr(dst, "shape", None)
        if dst_shape is not None and tuple(src_arr.shape) != tuple(dst_shape):
            if strict:
                raise ValueError(
                    f"{path}: shape mismatch {src_arr.shape} vs {dst_shape}"
                )
            if not silent:
                print(f"| skip {path}: ckpt {src_arr.shape} != model {dst_shape}")
            return dst
        return src_arr
    return merge(target, node, prefix)


class CheckpointManager:
    """Keep-N + best-val checkpoint policy over a work dir.

    ``save(step, payload, val_metric)`` writes ``model_ckpt_steps_<step>.ckpt``
    atomically, prunes to the newest ``num_keep`` step checkpoints, and when
    ``val_metric`` improves (per ``mode``) also writes ``model_ckpt_best.ckpt``.
    """

    def __init__(
        self,
        work_dir: str,
        num_keep: int = 2,
        save_best: bool = True,
        mode: str = "min",
    ):
        self.work_dir = work_dir
        self.num_keep = max(1, num_keep)
        self.save_best = save_best
        self.mode = mode
        self.best: float | None = None
        os.makedirs(work_dir, exist_ok=True)

    def _improved(self, metric: float) -> bool:
        if self.best is None:
            return True
        return metric < self.best if self.mode == "min" else metric > self.best

    def save(self, step: int, payload: dict, val_metric: float | None = None) -> str:
        path = os.path.join(self.work_dir, f"model_ckpt_steps_{step}.ckpt")
        save_checkpoint(path, payload)
        for _, old in get_all_checkpoints(self.work_dir)[: -self.num_keep]:
            try:
                os.remove(old)
            except OSError:
                pass
        if self.save_best and val_metric is not None and self._improved(val_metric):
            self.best = float(val_metric)
            save_checkpoint(
                os.path.join(self.work_dir, "model_ckpt_best.ckpt"), payload
            )
        return path

    def latest(self) -> str | None:
        return get_last_checkpoint(self.work_dir)

    def restore(self, step: int | None = None) -> dict | None:
        if step:
            path = os.path.join(self.work_dir, f"model_ckpt_steps_{step}.ckpt")
        else:
            path = self.latest()
        if not path or not os.path.exists(path):
            return None
        return load_checkpoint(path)
