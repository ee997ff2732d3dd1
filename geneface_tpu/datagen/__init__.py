"""Data-generation layer: preprocessing, feature extraction, binarization.

TPU-native re-design of the reference's ``data_util/`` + ``data_gen/`` trees
(SURVEY §2.8): video preprocessing orchestration, audio features, 3DMM face
tracking (a jitted JAX optimizer instead of the per-window torch Adam loops),
and the binarizers that produce the training artifacts consumed by
``geneface_tpu.data``.
"""

from geneface_tpu.datagen.face_tracker import (  # noqa: F401
    FaceBasis,
    fit_sequence,
    project_landmarks,
)
from geneface_tpu.datagen.face_recon import (  # noqa: F401
    Reconstructor,
    align_img,
    extract_5p,
    split_coeff,
)


def extract_3dmm_coeffs(frames, landmarks, reconstructor=None, batch_size=32):
    """Per-frame 257-D BFM coefficients from video frames + 68-point
    landmarks (``data_gen/nerf/extract_3dmm.py:30-122``): batched
    ``Reconstructor.recon_coeff`` sweeps → [T, 257] float32."""
    import numpy as np

    recon = reconstructor or Reconstructor()
    T = len(frames)
    out = []
    for lo in range(0, T, batch_size):
        hi = min(lo + batch_size, T)
        coeff, _ = recon.recon_coeff(
            np.asarray(frames[lo:hi]), np.asarray(landmarks[lo:hi]),
            return_image=False,
        )
        out.append(coeff)
    return np.concatenate(out, axis=0)
