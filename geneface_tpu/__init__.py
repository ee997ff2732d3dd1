"""geneface_tpu — TPU-native audio-driven talking-head synthesis framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of
GeneFace (audio → 3D landmarks → NeRF-rendered talking-head video):

- ``geneface_tpu.ops``       — compute kernels (grid/SH/freq encoders, occupancy
                               ray marching, volume compositing) in JAX + Pallas.
- ``geneface_tpu.models``    — Flax model families: vanilla/lm3d NeRF, RAD-NeRF
                               head+torso, audio2motion VAE+flow, postnet,
                               syncnet, audio2pose.
- ``geneface_tpu.training``  — generic functional trainer (pjit train step,
                               checkpointing, schedules, multi-optimizer).
- ``geneface_tpu.parallel``  — device-mesh / sharding utilities (dp/sp axes).
- ``geneface_tpu.data``      — binarized dataset readers + ray sampling.
- ``geneface_tpu.inference`` — end-to-end inference pipelines (wav → mp4).
"""

__version__ = "0.1.0"

from geneface_tpu.config import Config, load_config  # noqa: F401
