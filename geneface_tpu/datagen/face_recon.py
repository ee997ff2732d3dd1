"""Deep3DFaceRecon: learned single-image 3DMM coefficient regression.

TPU-native re-implementation of the reference's vendored
Deep3DFaceRecon_pytorch (``deep_3drecon/reconstructor.py:23-86``,
``deep_3drecon_models/networks.py:62-106`` + torchvision ResNet50): a
ResNet-50 backbone with seven 1×1-conv heads regressing the 257-D BFM
coefficient vector ``[id 80 | exp 64 | tex 80 | angle 3 | gamma 27 | tx ty |
tz]`` from a 224×224 aligned face crop. Used by the data pipeline to extract
per-frame 3DMM coefficients (``data_gen/nerf/extract_3dmm.py``, LRS3
``process_video_3dmm*.py``).

The alignment preprocessing (``deep_3drecon/util/preprocess.py``) is
reproduced in numpy/PIL: 5-point POS absolute-orientation fit against the
standard 3-D landmarks, rescale to ``rescale_factor/s``, 224² center crop.

Pretrained weights convert from the public PyTorch checkpoint via
``tools/convert_deep3drecon.py`` (torch → flax pytree ``.npz``); inference
runs jitted on TPU with batch-norm in running-stats mode.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = [
    "extract_5p",
    "POS",
    "align_img",
    "ReconNet",
    "Reconstructor",
    "split_coeff",
]


# ------------------------------------------------------------ alignment ----
def extract_5p(lm: np.ndarray) -> np.ndarray:
    """68 → 5 facial landmarks (``util/preprocess.py:160-166``)."""
    lm_idx = np.array([31, 37, 40, 43, 46, 49, 55]) - 1
    lm5p = np.stack(
        [
            lm[lm_idx[0], :],
            np.mean(lm[lm_idx[[1, 2]], :], 0),
            np.mean(lm[lm_idx[[3, 4]], :], 0),
            lm[lm_idx[5], :],
            lm[lm_idx[6], :],
        ],
        axis=0,
    )
    return lm5p[[1, 2, 0, 3, 4], :]


def POS(xp: np.ndarray, x: np.ndarray):
    """Least-squares scaled-orthographic pose from 2D↔3D point pairs
    (``util/preprocess.py:17-40``). xp: [2, N] image pts, x: [3, N] model
    pts → (t [2, 1], s scalar)."""
    npts = xp.shape[1]
    A = np.zeros([2 * npts, 8])
    A[0 : 2 * npts - 1 : 2, 0:3] = x.transpose()
    A[0 : 2 * npts - 1 : 2, 3] = 1
    A[1 : 2 * npts : 2, 4:7] = x.transpose()
    A[1 : 2 * npts : 2, 7] = 1
    b = np.reshape(xp.transpose(), [2 * npts, 1])
    k, _, _, _ = np.linalg.lstsq(A, b, rcond=None)
    R1, R2 = k[0:3], k[4:7]
    s = (np.linalg.norm(R1) + np.linalg.norm(R2)) / 2
    t = np.stack([k[3], k[7]], axis=0)
    return t, s


def _resize_n_crop_img(img_u8, lm, t, s, target_size=224.0):
    """``util/preprocess.py:136-157`` with PIL bicubic resampling."""
    from PIL import Image

    img = Image.fromarray(img_u8)
    w0, h0 = img.size
    w = (w0 * s).astype(np.int32)
    h = (h0 * s).astype(np.int32)
    left = (w / 2 - target_size / 2 + float((t[0] - w0 / 2) * s)).astype(np.int32)
    right = left + int(target_size)
    up = (h / 2 - target_size / 2 + float((h0 / 2 - t[1]) * s)).astype(np.int32)
    below = up + int(target_size)
    img = img.resize((int(w), int(h)), resample=Image.BICUBIC)
    img = img.crop((int(left), int(up), int(right), int(below)))
    lm = np.stack([lm[:, 0] - t[0] + w0 / 2, lm[:, 1] - t[1] + h0 / 2], axis=1) * s
    lm = lm - np.reshape(
        np.array([(w / 2 - target_size / 2), (h / 2 - target_size / 2)]), [1, 2]
    )
    return np.asarray(img), lm


def align_img(
    img_u8: np.ndarray,  # [H, W, 3] uint8
    lm: np.ndarray,  # [68, 2] or [5, 2]; y up (image-flipped), as reference
    lm3d_std: np.ndarray,  # [5, 3] standard 3-D landmarks
    target_size: float = 224.0,
    rescale_factor: float = 102.0,
):
    """``util/preprocess.py:168-198``: POS fit → rescale → center crop.
    Returns (trans_params [5], aligned_img [224, 224, 3] u8, lm_new)."""
    h0, w0 = img_u8.shape[:2]
    lm5p = extract_5p(lm) if lm.shape[0] != 5 else lm
    t, s = POS(lm5p.transpose(), lm3d_std.transpose())
    s = rescale_factor / s
    img_new, lm_new = _resize_n_crop_img(img_u8, lm, t, s, target_size)
    trans_params = np.array([w0, h0, s, float(t[0]), float(t[1])])
    return trans_params, img_new, lm_new


# -------------------------------------------------------------- network ----
class _Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9)
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False)(x)
        out = norm()(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False,
        )(out)
        out = norm()(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False)(out)
        out = norm()(out)
        if self.downsample:
            identity = nn.Conv(
                self.planes * 4, (1, 1), strides=(self.stride, self.stride),
                use_bias=False,
            )(x)
            identity = norm()(identity)
        return nn.relu(out + identity)


class ReconNet(nn.Module):
    """ResNet-50 + 7 coefficient heads → 257-D BFM coeffs
    (``networks.py:70-106``, torchvision Bottleneck [3, 4, 6, 3])."""

    layers: Sequence[int] = (3, 4, 6, 3)
    head_dims: Sequence[int] = (80, 64, 80, 3, 27, 2, 1)  # id/exp/tex/angle/gamma/txy/tz

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, 224, 224, 3] float in [0, 1] (RGB, as the reference feeds)
        norm = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False)(x)
        x = norm()(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        planes = 64
        for stage, n_blocks in enumerate(self.layers):
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = _Bottleneck(
                    planes=planes,
                    stride=stride,
                    downsample=(b == 0),
                )(x, train=train)
            planes *= 2
        x = jnp.mean(x, axis=(1, 2), keepdims=True)  # global avg pool [B,1,1,C]
        outs = [
            nn.Conv(d, (1, 1), use_bias=True, name=f"head_{i}")(x)
            for i, d in enumerate(self.head_dims)
        ]
        return jnp.concatenate(outs, axis=-1).reshape(x.shape[0], -1)  # [B, 257]


def split_coeff(coeffs: jnp.ndarray) -> dict:
    """257-D coeff vector → named groups (``deep_3drecon_models/bfm.py``
    split_coeff)."""
    return {
        "id": coeffs[..., 0:80],
        "exp": coeffs[..., 80:144],
        "tex": coeffs[..., 144:224],
        "angle": coeffs[..., 224:227],
        "gamma": coeffs[..., 227:254],
        "trans": coeffs[..., 254:257],
    }


# ---------------------------------------------------------- reconstructor --
# Standard 5-point 3-D landmarks of the BFM front face (nose-centered,
# y-up), matching load_lm3d's output up to the reference's normalization;
# override with the exact values from similarity_Lm3D_all.mat when available.
_DEFAULT_LM3D_STD = np.array(
    [
        [-0.31148657, 0.29036078, 0.13377953],
        [0.30979887, 0.28972036, 0.13179526],
        [0.0032535, -0.04617932, 0.55244243],
        [-0.25216928, -0.38133916, 0.22405732],
        [0.2484662, -0.38128927, 0.22235769],
    ],
    np.float32,
)


class Reconstructor:
    """``deep_3drecon.Reconstructor`` equivalent
    (``deep_3drecon/reconstructor.py:23-86``).

    ``recon_coeff(batched_images, batched_lm, return_image=True)`` →
    ``(coeff [B, 257], aligned_images [B, 224, 224, 3] u8)``. Landmarks may
    be 68- or 5-point, in the reference's y-up convention *before* the
    internal flip (the reference flips y as ``lm[:, -1] = H-1-lm[:, -1]``).
    """

    def __init__(
        self,
        params: Any | None = None,
        lm3d_std: np.ndarray | None = None,
        rescale_factor: float = 102.0,
    ):
        self.net = ReconNet()
        if params is None:
            rng = jax.random.PRNGKey(0)
            params = self.net.init(rng, jnp.zeros((1, 224, 224, 3)), train=False)
        self.params = params
        self.lm3d_std = (
            np.asarray(lm3d_std, np.float32)
            if lm3d_std is not None
            else _DEFAULT_LM3D_STD
        )
        self.rescale_factor = rescale_factor
        self._fwd = jax.jit(
            lambda p, x: self.net.apply(p, x, train=False)
        )

    @classmethod
    def from_npz(cls, path: str, **kwargs) -> "Reconstructor":
        """Load converted weights (see ``tools/convert_deep3drecon.py``)."""
        import pickle

        with np.load(path, allow_pickle=True) as z:
            params = pickle.loads(z["params"].tobytes())
        return cls(params=params, **kwargs)

    def preprocess(self, img_u8: np.ndarray, lm: np.ndarray):
        H = img_u8.shape[0]
        lm = np.asarray(lm, np.float64).reshape(-1, 2).copy()
        lm[:, -1] = H - 1 - lm[:, -1]  # reconstructor.py:38
        _, aligned, _lm = align_img(
            np.asarray(img_u8, np.uint8), lm, self.lm3d_std,
            rescale_factor=self.rescale_factor,
        )
        return aligned

    def recon_coeff(
        self,
        batched_images: np.ndarray,  # [B, H, W, 3] uint8
        batched_lm: np.ndarray,  # [B, 68|5, 2]
        return_image: bool = True,
        batch_mode: bool = True,  # signature parity; batched either way
    ):
        aligned = np.stack(
            [
                self.preprocess(batched_images[i], batched_lm[i])
                for i in range(batched_images.shape[0])
            ]
        )
        x = jnp.asarray(aligned, jnp.float32) / 255.0
        coeff = np.asarray(self._fwd(self.params, x))
        if return_image:
            return coeff, aligned
        return coeff, None

    __call__ = recon_coeff
