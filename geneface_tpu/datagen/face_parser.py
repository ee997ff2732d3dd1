"""Face parsing: BiSeNet semantic segmentation in Flax.

Re-design of ``data_util/face_parsing/{model,resnet}.py`` (BiSeNet with a
ResNet-18 context path, attention-refinement modules and a feature-fusion
module, 19 CelebAMask classes). Pretrained torch weights are not shipped in
this image; load converted weights from ``.npz`` via
:func:`load_parser_npz`, or use :func:`masks_from_probs` /
:func:`collapse_to_regions` on externally computed label maps.

``collapse_to_regions`` maps the 19 classes onto the 4-region convention the
preprocessing pipeline consumes (0 bg / 1 head / 2 neck / 3 torso), exactly
as ``data_util/process.py:42-66``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "BiSeNet",
    "collapse_to_regions",
    "load_parser_npz",
    "parse_frame",
]

# CelebAMask-HQ classes of the reference checkpoint
# 0 bg, 1 skin, 2-3 brows, 4-5 eyes, 6 glasses, 7-8 ears, 9 earring,
# 10 nose, 11 mouth, 12-13 lips, 14 neck, 15 necklace, 16 cloth, 17 hair,
# 18 hat
_HEAD_CLASSES = (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 17, 18)
_NECK_CLASSES = (14, 15)
_TORSO_CLASSES = (16,)


def collapse_to_regions(labels: np.ndarray) -> np.ndarray:
    """19-class label map → {0 bg, 1 head, 2 neck, 3 torso}."""
    out = np.zeros_like(labels)
    out[np.isin(labels, _HEAD_CLASSES)] = 1
    out[np.isin(labels, _NECK_CLASSES)] = 2
    out[np.isin(labels, _TORSO_CLASSES)] = 3
    return out


class _BasicBlock(nn.Module):
    features: int
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), (self.strides, self.strides),
                    padding=1, use_bias=False)(x)
        h = nn.relu(nn.LayerNorm()(h))
        h = nn.Conv(self.features, (3, 3), padding=1, use_bias=False)(h)
        h = nn.LayerNorm()(h)
        if x.shape[-1] != self.features or self.strides != 1:
            x = nn.Conv(self.features, (1, 1), (self.strides, self.strides),
                        use_bias=False)(x)
            x = nn.LayerNorm()(x)
        return nn.relu(x + h)


class _ResNet18(nn.Module):
    """Context-path backbone returning /8, /16 and /32 features."""

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False)(x)
        h = nn.relu(nn.LayerNorm()(h))
        h = nn.max_pool(h, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        for blk in range(2):
            h = _BasicBlock(64)(h)
        h = _BasicBlock(128, 2)(h)
        h = _BasicBlock(128)(h)
        f8 = h  # /8
        h = _BasicBlock(256, 2)(h)
        h = _BasicBlock(256)(h)
        f16 = h  # /16
        h = _BasicBlock(512, 2)(h)
        h = _BasicBlock(512)(h)
        f32 = h  # /32
        return f8, f16, f32


class _ARM(nn.Module):
    """Attention refinement: global-pool gate over a 3x3 conv."""

    features: int

    @nn.compact
    def __call__(self, x):
        feat = nn.Conv(self.features, (3, 3), padding=1, use_bias=False)(x)
        feat = nn.relu(nn.LayerNorm()(feat))
        att = jnp.mean(feat, axis=(1, 2), keepdims=True)
        att = nn.Conv(self.features, (1, 1), use_bias=False)(att)
        att = jax.nn.sigmoid(nn.LayerNorm()(att))
        return feat * att


class _FFM(nn.Module):
    """Feature fusion of spatial + context paths."""

    features: int

    @nn.compact
    def __call__(self, sp, cx):
        h = jnp.concatenate([sp, cx], -1)
        feat = nn.Conv(self.features, (1, 1), use_bias=False)(h)
        feat = nn.relu(nn.LayerNorm()(feat))
        att = jnp.mean(feat, axis=(1, 2), keepdims=True)
        att = nn.relu(nn.Conv(self.features // 4, (1, 1))(att))
        att = jax.nn.sigmoid(nn.Conv(self.features, (1, 1))(att))
        return feat + feat * att


def _upsample(x, hw):
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[-1]),
                            "bilinear")


class BiSeNet(nn.Module):
    n_classes: int = 19

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, 3] float in [0,1] → logits [B, H, W, n_classes]."""
        H, W = x.shape[1], x.shape[2]
        f8, f16, f32 = _ResNet18(name="backbone")(x)

        avg = jnp.mean(f32, axis=(1, 2), keepdims=True)
        avg = nn.relu(nn.Conv(128, (1, 1), use_bias=False, name="gap_conv")(avg))

        c32 = _ARM(128, name="arm32")(f32) + avg
        c32 = _upsample(c32, (f16.shape[1], f16.shape[2]))
        c32 = nn.relu(nn.Conv(128, (3, 3), padding=1, name="refine32")(c32))

        c16 = _ARM(128, name="arm16")(f16) + c32
        c16 = _upsample(c16, (f8.shape[1], f8.shape[2]))
        c16 = nn.relu(nn.Conv(128, (3, 3), padding=1, name="refine16")(c16))

        fused = _FFM(256, name="ffm")(f8, c16)
        out = nn.relu(nn.Conv(64, (3, 3), padding=1, name="head_conv")(fused))
        out = nn.Conv(self.n_classes, (1, 1), name="head_out")(out)
        return _upsample(out, (H, W))


def load_parser_npz(path: str):
    """(module, params) from a converted checkpoint ``.npz`` holding the
    flattened param pytree (see flax.traverse_util)."""
    from flax.traverse_util import unflatten_dict

    data = np.load(path)
    flat = {tuple(k.split("/")): jnp.asarray(v) for k, v in data.items()}
    return BiSeNet(), {"params": unflatten_dict(flat)}


def parse_frame(model: BiSeNet, params, frame: np.ndarray) -> np.ndarray:
    """uint8 [H,W,3] → 4-region mask [H,W] (jitted argmax + collapse)."""
    x = jnp.asarray(frame, jnp.float32)[None] / 255.0
    logits = jax.jit(model.apply)(params, x)
    labels = np.asarray(jnp.argmax(logits[0], -1))
    return collapse_to_regions(labels)
