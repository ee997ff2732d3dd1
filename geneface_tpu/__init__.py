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

import os as _os


def _enable_persistent_compile_cache(_force: bool = False):
    """Cache XLA executables across processes (the RAD-NeRF train step takes
    minutes to compile on TPU; the cache turns repeat launches into ms).

    Opt-out via ``GENEFACE_NO_COMPILE_CACHE=1`` (or ``true``/``yes``). Safe
    to call before or after backends initialize — it only sets jax config
    values. Respects a user-set ``JAX_COMPILATION_CACHE_DIR`` and the
    JAX-default cache thresholds (min compile time 1 s / min size 0 are the
    library defaults; users tune them via the standard JAX env vars).
    """
    if _os.environ.get("GENEFACE_NO_COMPILE_CACHE", "").lower() in (
        "1", "true", "yes",
    ):
        return
    import sys as _sys

    if "jax" not in _sys.modules and not _force:
        # keep `import geneface_tpu` side-effect-free for config-only users:
        # the trainer/CLI/inference entry points call this again with
        # _force=True before compiling anything
        return
    try:
        import jax

        cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.expanduser("~/.cache/geneface_tpu/xla_cache"),
        )
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception as e:  # pragma: no cover - cache is best-effort
        import warnings

        warnings.warn(
            f"geneface_tpu: persistent compile cache disabled ({e!r}); "
            "set GENEFACE_NO_COMPILE_CACHE=1 to silence",
            stacklevel=1,
        )


_enable_persistent_compile_cache()

from geneface_tpu.config import Config, load_config  # noqa: F401, E402
