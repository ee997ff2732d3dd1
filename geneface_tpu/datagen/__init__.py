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
