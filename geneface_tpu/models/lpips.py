"""LPIPS perceptual distance in pure JAX/Flax.

TPU-native replacement for the ``lpips.LPIPS(net='alex')`` criterion the
reference uses for the lip fine-tune phase (``tasks/radnerfs/radnerf.py:34``
and ``:152``). Architecture mirrors the published LPIPS formulation:

    d(x, y) = sum_l mean_hw || w_l ⊙ (phi_l(x)/|phi_l(x)| − phi_l(y)/|phi_l(y)|) ||²

with ``phi_l`` the five AlexNet relu feature stacks and ``w_l`` non-negative
1×1 linear heads.

Weights: this environment ships no pretrained perceptual weights, so the
module initializes randomly by default — random conv features are a known
usable perceptual prior — and supports loading converted weights from an
``.npz`` (see :func:`load_lpips_npz` and ``tools/convert_lpips_torch.py``).
Everything here jits cleanly: static shapes, conv/matmul on the MXU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LPIPS", "load_lpips_npz", "lpips_params_from_npz"]

# Input normalization of the reference implementation (ScalingLayer).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet feature stack: (out_channels, kernel, stride, padding), with a
# 3x3/2 max-pool before stages 2 and 3.
_ALEX_CFG = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
_POOL_BEFORE = (1, 2)  # pool before conv index 1 and 2


class _AlexFeatures(nn.Module):
    """AlexNet conv tower returning the five relu feature maps (NHWC)."""

    @nn.compact
    def __call__(self, x):
        feats = []
        for i, (ch, k, s, p) in enumerate(_ALEX_CFG):
            if i in _POOL_BEFORE:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
            x = nn.Conv(ch, (k, k), strides=(s, s), padding=p, name=f"conv{i}")(x)
            x = nn.relu(x)
            feats.append(x)
        return feats


def _unit_normalize(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """Perceptual distance between image batches.

    Inputs are NHWC float images. ``input_range``:
      - ``"unit"``  (default): images in [0, 1] — the renderer's output
        convention; internally mapped to [-1, 1] as LPIPS expects.
      - ``"pm1"``: images already in [-1, 1].
    Returns a per-image distance ``[N]``.
    """

    input_range: str = "unit"

    @nn.compact
    def __call__(self, x, y):
        if x.shape[1] < 32 or x.shape[2] < 32:
            raise ValueError(
                f"LPIPS needs inputs >= 32x32 (got {x.shape[1]}x{x.shape[2]}): "
                "the AlexNet stack pools smaller maps to zero size"
            )
        if self.input_range == "unit":
            x = 2.0 * x - 1.0
            y = 2.0 * y - 1.0
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        x = (x - shift) / scale
        y = (y - shift) / scale

        tower = _AlexFeatures(name="alex")
        fx = tower(x)
        fy = tower(y)

        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            diff = _unit_normalize(a) - _unit_normalize(b)
            # non-negative 1x1 head, as the reference's NetLinLayer
            w = self.param(
                f"lin{i}",
                nn.initializers.uniform(scale=1.0),
                (diff.shape[-1],),
                jnp.float32,
            )
            d = jnp.sum(diff * diff * jax.nn.relu(w), axis=-1)  # [N, H, W]
            total = total + jnp.mean(d, axis=(1, 2))
        return total


def lpips_params_from_npz(path: str):
    """Build an LPIPS param pytree from a converted ``.npz``.

    Expected keys: ``conv{i}/kernel`` (HWIO), ``conv{i}/bias``, ``lin{i}``
    for i in 0..4 (see ``tools/convert_lpips_torch.py``).
    """
    data = np.load(path)
    convs = {
        f"conv{i}": {
            "kernel": jnp.asarray(data[f"conv{i}/kernel"]),
            "bias": jnp.asarray(data[f"conv{i}/bias"]),
        }
        for i in range(5)
    }
    params = {"alex": convs}
    for i in range(5):
        params[f"lin{i}"] = jnp.asarray(data[f"lin{i}"])
    return {"params": params}


def load_lpips_npz(path: str, input_range: str = "unit"):
    """Return ``(module, params)`` ready for ``module.apply(params, x, y)``."""
    return LPIPS(input_range=input_range), lpips_params_from_npz(path)
