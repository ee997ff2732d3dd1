"""Face parsing: BiSeNet semantic segmentation in Flax.

Re-design of ``data_util/face_parsing/{model,resnet}.py`` — BiSeNet with a
ResNet-18 context path, attention-refinement modules and a feature-fusion
module, 19 CelebAMask classes. The module mirrors the reference layer graph
EXACTLY (module names parallel the torch attribute paths) with frozen
running-stats BatchNorm, so the published ``79999_iter.pth`` checkpoint
imports bit-faithfully via ``tools/convert_bisenet_torch.py`` (the parser is
inference-only in the pipeline — ``data_util/process.py:42-66`` — so
eval-mode BN is the only semantics needed; golden test
``tests/test_face_parser_golden.py``).

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


def _bn(name):
    # eval-mode semantics of the reference's nn.BatchNorm2d
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                        momentum=0.1, name=name)


class ConvBNReLU(nn.Module):
    """``model.py:14-29``: bias-free conv → BN → relu."""

    out_chan: int
    ks: int = 3
    stride: int = 1
    padding: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_chan, (self.ks, self.ks),
                    (self.stride, self.stride), padding=self.padding,
                    use_bias=False, name="conv")(x)
        return nn.relu(_bn("bn")(x))


class _BasicBlock(nn.Module):
    """``resnet.py`` BasicBlock: conv-bn-relu, conv-bn (+ conv-bn shortcut)."""

    features: int
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), (self.strides, self.strides),
                    padding=1, use_bias=False, name="conv1")(x)
        h = nn.relu(_bn("bn1")(h))
        h = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    name="conv2")(h)
        h = _bn("bn2")(h)
        if x.shape[-1] != self.features or self.strides != 1:
            x = nn.Conv(self.features, (1, 1), (self.strides, self.strides),
                        use_bias=False, name="downsample_conv")(x)
            x = _bn("downsample_bn")(x)
        return nn.relu(x + h)


class Resnet18(nn.Module):
    """Context-path backbone returning /8, /16 and /32 features
    (``resnet.py:58-80``)."""

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        h = nn.relu(_bn("bn1")(h))
        h = nn.max_pool(h, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        h = _BasicBlock(64, name="layer1_0")(h)
        h = _BasicBlock(64, name="layer1_1")(h)
        h = _BasicBlock(128, 2, name="layer2_0")(h)
        f8 = h = _BasicBlock(128, name="layer2_1")(h)  # /8
        h = _BasicBlock(256, 2, name="layer3_0")(h)
        f16 = h = _BasicBlock(256, name="layer3_1")(h)  # /16
        h = _BasicBlock(512, 2, name="layer4_0")(h)
        f32 = _BasicBlock(512, name="layer4_1")(h)  # /32
        return f8, f16, f32


class AttentionRefinementModule(nn.Module):
    """``model.py:66-88``: ConvBNReLU then a global-pool BN-sigmoid gate."""

    out_chan: int

    @nn.compact
    def __call__(self, x):
        feat = ConvBNReLU(self.out_chan, name="conv")(x)
        att = jnp.mean(feat, axis=(1, 2), keepdims=True)
        att = nn.Conv(self.out_chan, (1, 1), use_bias=False,
                      name="conv_atten")(att)
        att = jax.nn.sigmoid(_bn("bn_atten")(att))
        return feat * att


def _upsample_nearest(x, hw):
    return jax.image.resize(
        x, (x.shape[0], hw[0], hw[1], x.shape[-1]), "nearest"
    )


def _upsample_bilinear_ac(x, hw):
    """Bilinear with ``align_corners=True`` (torch ``F.interpolate``
    convention the reference uses for the final logits —
    ``model.py:251-253``; jax.image.resize only does half-pixel centers)."""

    def axis_interp(x, out_len, axis):
        in_len = x.shape[axis]
        if in_len == out_len:
            return x
        if in_len == 1:
            reps = [1] * x.ndim
            reps[axis] = out_len
            return jnp.tile(x, reps)
        pos = jnp.arange(out_len, dtype=jnp.float32) * (
            (in_len - 1) / (out_len - 1)
        )
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, in_len - 2)
        w = (pos - i0.astype(jnp.float32)).reshape(
            [-1 if a == axis else 1 for a in range(x.ndim)]
        )
        a = jnp.take(x, i0, axis=axis)
        b = jnp.take(x, i0 + 1, axis=axis)
        return a * (1.0 - w) + b * w

    x = axis_interp(x, hw[0], 1)
    return axis_interp(x, hw[1], 2)


class ContextPath(nn.Module):
    """``model.py:91-120``: ARM-refined /16 and /32 features with a global
    average context, NEAREST upsampling between stages."""

    @nn.compact
    def __call__(self, x):
        f8, f16, f32 = Resnet18(name="resnet")(x)
        avg = jnp.mean(f32, axis=(1, 2), keepdims=True)
        avg = ConvBNReLU(128, ks=1, padding=0, name="conv_avg")(avg)
        avg_up = _upsample_nearest(avg, (f32.shape[1], f32.shape[2]))

        f32_arm = AttentionRefinementModule(128, name="arm32")(f32)
        f32_sum = f32_arm + avg_up
        f32_up = _upsample_nearest(f32_sum, (f16.shape[1], f16.shape[2]))
        f32_up = ConvBNReLU(128, name="conv_head32")(f32_up)

        f16_arm = AttentionRefinementModule(128, name="arm16")(f16)
        f16_sum = f16_arm + f32_up
        f16_up = _upsample_nearest(f16_sum, (f8.shape[1], f8.shape[2]))
        f16_up = ConvBNReLU(128, name="conv_head16")(f16_up)
        return f8, f16_up, f32_up


class FeatureFusionModule(nn.Module):
    """``model.py:184-211``: concat → ConvBNReLU 1x1 → squeeze-excite gate."""

    out_chan: int

    @nn.compact
    def __call__(self, fsp, fcp):
        fcat = jnp.concatenate([fsp, fcp], axis=-1)
        feat = ConvBNReLU(self.out_chan, ks=1, padding=0, name="convblk")(fcat)
        att = jnp.mean(feat, axis=(1, 2), keepdims=True)
        att = nn.Conv(self.out_chan // 4, (1, 1), use_bias=False,
                      name="conv1")(att)
        att = nn.relu(att)
        att = nn.Conv(self.out_chan, (1, 1), use_bias=False, name="conv2")(att)
        att = jax.nn.sigmoid(att)
        return feat * att + feat


class BiSeNetOutput(nn.Module):
    """``model.py:36-53``: ConvBNReLU → bias-free 1x1 classifier."""

    mid_chan: int
    n_classes: int

    @nn.compact
    def __call__(self, x):
        x = ConvBNReLU(self.mid_chan, name="conv")(x)
        return nn.Conv(self.n_classes, (1, 1), use_bias=False,
                       name="conv_out")(x)


class BiSeNet(nn.Module):
    """``model.py:229-256``: the spatial path is the resnet /8 feature."""

    n_classes: int = 19

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, 3] float (ImageNet-normalized by the caller, see
        :func:`parse_frame`) → main logits [B, H, W, n_classes]."""
        H, W = x.shape[1], x.shape[2]
        f_res8, f_cp8, f_cp16 = ContextPath(name="cp")(x)
        fused = FeatureFusionModule(256, name="ffm")(f_res8, f_cp8)
        out = BiSeNetOutput(256, self.n_classes, name="conv_out")(fused)
        return _upsample_bilinear_ac(out, (H, W))


# ImageNet normalization of the reference inference entry
# (data_util/face_parsing/test.py: ToTensor + Normalize)
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def load_parser_npz(path: str):
    """(module, variables) from a converted checkpoint ``.npz`` holding the
    flattened variables pytree — both ``params`` and ``batch_stats``
    (see ``tools/convert_bisenet_torch.py``)."""
    from flax.traverse_util import unflatten_dict

    data = np.load(path)
    flat = {tuple(k.split("/")): jnp.asarray(v) for k, v in data.items()}
    return BiSeNet(), unflatten_dict(flat)


def parse_frame(model: BiSeNet, variables, frame: np.ndarray) -> np.ndarray:
    """uint8 [H,W,3] RGB → 4-region mask [H,W] (jitted argmax + collapse)."""
    x = np.asarray(frame, np.float32) / 255.0
    x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
    logits = jax.jit(model.apply)(variables, jnp.asarray(x)[None])
    labels = np.asarray(jnp.argmax(logits[0], -1))
    return collapse_to_regions(labels)
