"""Optimizer construction: multi-group Adam/RMSprop via optax.

The reference builds torch param groups by name filtering
(``tasks/radnerfs/radnerf.py:58-76``: net lr×1, grid embedders lr×10,
attention net lr×5, Adam eps 1e-15) and mutates group lrs in its schedulers
(``utils/nn/schedulers.py:112-206``). Here the same structure is an
``optax.multi_transform`` over a label tree derived from parameter paths,
each group carrying the shared schedule times its multiplier.
"""

from __future__ import annotations

from typing import Callable, Mapping

import jax
import optax

__all__ = [
    "finalize_optimizer",
    "label_params",
    "multi_group_adam",
    "radnerf_label_fn",
    "radnerf_torso_label_fn",
]


def finalize_optimizer(
    tx: optax.GradientTransformation, cfg
) -> optax.GradientTransformation:
    """Apply the trainer-level optimizer wrappers every task shares.

    - ``accumulate_grad_batches`` > 1 → ``optax.MultiSteps``: gradients are
      averaged over k micro-batches and applied once (reference
      ``utils/commons/trainer.py:340,367``).
    - ``guard_nan_grads`` (default on) → ``optax.apply_if_finite``: a step
      whose gradients contain nan/inf is skipped instead of poisoning the
      params (reference's ``print_nan_grads`` detection,
      ``trainer.py:357-364``, upgraded from print-and-continue to
      skip-and-count; the skip count is exposed in the opt state).
    """
    k = int(cfg.get("accumulate_grad_batches", 1))
    if k > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=k)
    if cfg.get("guard_nan_grads", True):
        tx = optax.apply_if_finite(tx, max_consecutive_errors=10**8)
    return tx


def label_params(params, label_of_path: Callable[[str], str]):
    """Build a label pytree: each leaf labeled by its '/'-joined path."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        parts = []
        for k in kp:
            name = getattr(k, "key", None)
            parts.append(str(name) if name is not None else str(k))
        return "/".join(parts)

    labels_flat = [label_of_path(path_str(kp)) for kp, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, labels_flat)


def radnerf_label_fn(path: str) -> str:
    """Group labels per ``tasks/radnerfs/radnerf.py:42-46``."""
    if "pos_embeddings" in path or "ambient_embeddings" in path or "torso_embeddings" in path:
        return "grid"
    if "cond_att_net" in path:
        return "att"
    return "net"


def radnerf_torso_label_fn(path: str) -> str:
    """Torso fine-tune groups (``tasks/radnerfs/radnerf_torso.py``): grids ×10,
    rest ×1 (no separate att group)."""
    if "torso_embeddings" in path:
        return "grid"
    return "net"


def multi_group_adam(
    params,
    schedule: optax.Schedule,
    label_of_path: Callable[[str], str],
    multipliers: Mapping[str, float],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
    clip_grad_norm: float = 0.0,
    clip_grad_value: float = 0.0,
) -> optax.GradientTransformation:
    """Adam with per-group lr multipliers on a shared schedule."""

    def group_tx(mult):
        return optax.chain(
            optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
            optax.scale_by_learning_rate(lambda step: schedule(step) * mult),
        )

    tx = optax.multi_transform(
        {name: group_tx(mult) for name, mult in multipliers.items()},
        label_params(params, label_of_path),
    )
    pre = []
    if clip_grad_value > 0:
        pre.append(optax.clip(clip_grad_value))
    if clip_grad_norm > 0:
        pre.append(optax.clip_by_global_norm(clip_grad_norm))
    return optax.chain(*pre, tx) if pre else tx
