"""2-D facial landmark detector: FAN (2DFAN-4) in Flax.

In-repo replacement for the reference's external ``face_alignment`` call in
preprocessing task 7 (``data_util/process.py:50-65``): a 4-module stacked
hourglass network producing 68 heatmaps at 64×64 from a 256×256 face crop,
decoded to pixel landmarks with the quarter-pixel neighbor shift.

Weights-gated like the ASR feature extractors: the published
``2DFAN4-cd938726ad.zip`` torch checkpoint converts via
``tools/convert_fan_torch.py`` (this image ships no pretrained weights and
has no egress, so runs without a converted ``.npz`` fall back to the
``lm_fn`` hook in :mod:`geneface_tpu.datagen.process`).

Face localisation: the reference chains an SFD face detector before FAN;
talking-head preprocessing already runs BiSeNet parsing (task 4), so the
crop box here comes from the parser's head mask (``head_crop_from_mask``) —
one model fewer, same cropped-portrait regime.

All convolutions are NHWC; BatchNorm is frozen running-stats (eval-mode
semantics of the trained torch checkpoint, like ``face_parser.py``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "FAN",
    "decode_heatmaps",
    "head_crop_from_mask",
    "FANLandmarker",
]


def _bn():
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                        momentum=0.9, dtype=jnp.float32)


def _conv3(ch):
    return nn.Conv(ch, (3, 3), padding=1, use_bias=False)


class ConvBlock(nn.Module):
    """bn-relu-conv ×3 with channel split 1/2+1/4+1/4 and concat
    (face_alignment ``models.ConvBlock``)."""

    out_planes: int

    @nn.compact
    def __call__(self, x):
        inp = x
        c = self.out_planes
        o1 = _conv3(c // 2)(nn.relu(_bn()(x)))
        o2 = _conv3(c // 4)(nn.relu(_bn()(o1)))
        o3 = _conv3(c // 4)(nn.relu(_bn()(o2)))
        out = jnp.concatenate([o1, o2, o3], axis=-1)
        if inp.shape[-1] != c:
            inp = nn.Conv(c, (1, 1), use_bias=False, name="downsample_conv")(
                nn.relu(_bn()(inp))
            )
        return out + inp


class HourGlass(nn.Module):
    """Depth-4 recursive hourglass, 256 features (``models.HourGlass``)."""

    depth: int = 4

    @nn.compact
    def __call__(self, x):
        def level(lv, inp):
            up1 = ConvBlock(256, name=f"b1_{lv}")(inp)
            low = nn.avg_pool(inp, (2, 2), strides=(2, 2))
            low = ConvBlock(256, name=f"b2_{lv}")(low)
            if lv > 1:
                low2 = level(lv - 1, low)
            else:
                low2 = ConvBlock(256, name=f"b2_plus_{lv}")(low)
            low3 = ConvBlock(256, name=f"b3_{lv}")(low2)
            up2 = jax.image.resize(
                low3, up1.shape, method="nearest"
            )
            return up1 + up2

        return level(self.depth, x)


class FAN(nn.Module):
    """[B, 256, 256, 3] normalized RGB (0..1) → [B, 64, 64, 68] heatmaps
    of the LAST hourglass module (``models.FAN.forward``)."""

    num_modules: int = 4

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=True,
                    name="conv1")(x)
        x = nn.relu(_bn()(x))
        x = ConvBlock(128, name="conv2")(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(128, name="conv3")(x)
        x = ConvBlock(256, name="conv4")(x)
        previous = x
        out = None
        for i in range(self.num_modules):
            hg = HourGlass(name=f"m{i}")(previous)
            ll = ConvBlock(256, name=f"top_m_{i}")(hg)
            ll = nn.Conv(256, (1, 1), name=f"conv_last{i}")(ll)
            ll = nn.relu(_bn()(ll))
            out = nn.Conv(68, (1, 1), name=f"l{i}")(ll)
            if i < self.num_modules - 1:
                ll = nn.Conv(256, (1, 1), name=f"bl{i}")(ll)
                tmp = nn.Conv(256, (1, 1), name=f"al{i}")(out)
                previous = previous + ll + tmp
        return out


def decode_heatmaps(hm: np.ndarray) -> np.ndarray:
    """[68, Hh, Wh] heatmaps → [68, 2] (x, y) in heatmap pixels, with the
    quarter-pixel shift toward the larger neighbor
    (``face_alignment.utils.get_preds_fromhm``)."""
    hm = np.asarray(hm)
    L, Hh, Wh = hm.shape
    flat = hm.reshape(L, -1)
    idx = flat.argmax(axis=-1)
    ys, xs = np.divmod(idx, Wh)
    pts = np.stack([xs, ys], -1).astype(np.float32)
    for i in range(L):
        x, y = int(xs[i]), int(ys[i])
        if 0 < x < Wh - 1:
            pts[i, 0] += 0.25 * np.sign(hm[i, y, x + 1] - hm[i, y, x - 1])
        if 0 < y < Hh - 1:
            pts[i, 1] += 0.25 * np.sign(hm[i, y + 1, x] - hm[i, y - 1, x])
    return pts + 0.5


def head_crop_from_mask(mask: np.ndarray, pad: float = 0.35) -> tuple:
    """Square crop box (x0, y0, side) around the head-mask bbox.

    Replaces the SFD detector stage: preprocessing already computed the
    BiSeNet segmentation (task 4); class 1 is the head."""
    ys, xs = np.nonzero(mask == 1)
    H, W = mask.shape
    if len(ys) == 0:
        side = min(H, W)
        return (W - side) // 2, (H - side) // 2, side
    cy, cx = (ys.min() + ys.max()) / 2, (xs.min() + xs.max()) / 2
    side = max(ys.max() - ys.min(), xs.max() - xs.min()) * (1.0 + pad)
    side = int(min(max(side, 32), min(H, W)))
    x0 = int(np.clip(cx - side / 2, 0, W - side))
    y0 = int(np.clip(cy - side / 2, 0, H - side))
    return x0, y0, side


class FANLandmarker:
    """``lm_fn``-compatible callable: frame (+ optional parsing mask) →
    [68, 2] pixel landmarks (the task-7 signature of
    :func:`geneface_tpu.datagen.process.process_video`)."""

    def __init__(self, variables):
        self.model = FAN()
        self.variables = variables
        self._apply = jax.jit(lambda v, x: self.model.apply(v, x))

    @classmethod
    def from_npz(cls, path: str):
        """Converted-checkpoint ``.npz`` (tools/convert_fan_torch.py) —
        flattened variables pytree, same convention as ``load_parser_npz``."""
        from flax.traverse_util import unflatten_dict

        data = np.load(path)
        flat = {tuple(k.split("/")): jnp.asarray(v) for k, v in data.items()}
        return cls(unflatten_dict(flat))

    def __call__(self, frame: np.ndarray, mask: np.ndarray | None = None):
        frame = np.asarray(frame)
        H, W = frame.shape[:2]
        if mask is not None:
            x0, y0, side = head_crop_from_mask(np.asarray(mask))
        else:
            side = min(H, W)
            x0, y0 = (W - side) // 2, (H - side) // 2
        crop = frame[y0 : y0 + side, x0 : x0 + side]
        import cv2

        inp = cv2.resize(crop, (256, 256), interpolation=cv2.INTER_LINEAR)
        inp = inp.astype(np.float32) / 255.0
        hm = np.asarray(self._apply(self.variables, inp[None]))[0]
        pts = decode_heatmaps(hm.transpose(2, 0, 1))  # [68, 2] in 64-space
        return pts * (side / 64.0) + np.asarray([x0, y0], np.float32)
