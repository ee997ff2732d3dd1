"""Device mesh + sharding utilities.

The reference's only parallelism is single-node data parallelism via NCCL DDP
(``utils/commons/trainer.py:117-118,478-498``; SURVEY §2.9). The TPU-native
equivalent implemented here: a ``jax.sharding.Mesh`` over all chips with two
logical axes —

- ``data``: batches / rays / frames sharded across chips (DP and the "sequence
  parallel" axis of this workload: the N-rays dimension, SURVEY §5),
- ``model``: reserved for tensor-parallel sharding of wide layers (unused by
  the small NeRF MLPs by default, available for the VAE/transformer stacks).

Gradient all-reduce is emitted by XLA from sharding constraints inside the
pjit-compiled train step (no NCCL-equivalent user code, SURVEY §2.9).
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "host_local_slice",
    "initialize_distributed",
    "P",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed() -> None:
    """Multi-host bootstrap (replaces MASTER_ADDR/PORT + NCCL init,
    ``utils/commons/base_task.py:229``, ``trainer.py:484-498``).

    No-op for single-process runs; controlled by standard JAX env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID) when launched on a pod.
    """
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices: Sequence[Any] | None = None,
) -> Mesh:
    """Create a ``(data, model)`` mesh over ``devices`` (default: all)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} != {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1, axis: int = 0) -> NamedSharding:
    """Shard dimension ``axis`` of an ``ndim``-rank array over the data axis."""
    spec = [None] * ndim
    spec[axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_sharded(mesh: Mesh, x: Any, sharding: NamedSharding) -> Any:
    """Place one array with ``sharding``; works single- and multi-process.

    Single process: a plain ``device_put``. Multi-host: every host holds the
    full global array (the datasets are per-video numpy stores replicated on
    each host), so each addressable shard is materialized via
    ``make_array_from_callback`` — no cross-host transfer.

    INVARIANT (multi-host): every process must pass the bit-identical global
    ``x`` — dataset RNG streams are seeded host-independently so replicated
    numpy stores sample the same batch everywhere. ``GF_CHECK_GLOBAL_BATCH=1``
    verifies this per call with an all-gathered checksum (debug aid; one tiny
    collective per leaf).
    """
    x = np.asarray(x) if not hasattr(x, "ndim") else x
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    if os.environ.get("GF_CHECK_GLOBAL_BATCH"):
        from jax.experimental import multihost_utils

        h = np.float64(np.asarray(x, np.float64).sum()) if np.issubdtype(
            np.asarray(x).dtype, np.number
        ) else np.float64(0.0)
        all_h = multihost_utils.process_allgather(np.asarray([h]))
        assert np.all(all_h == all_h[0]), (
            f"global-batch invariant violated: per-host checksums {all_h}"
        )
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def shard_batch(mesh: Mesh, batch: Any, axis: int = 0) -> Any:
    """Place every array leaf of ``batch`` sharded over the data axis.

    Scalar / low-rank / non-divisible leaves (rank <= axis or leading dim not
    divisible by the mesh) are replicated.
    """

    def put(x):
        x = np.asarray(x) if not hasattr(x, "ndim") else x
        if x.ndim > axis and x.shape[axis] % mesh.shape[DATA_AXIS] == 0:
            return put_sharded(mesh, x, data_sharding(mesh, x.ndim, axis))
        return put_sharded(mesh, x, replicated(mesh))

    return jax.tree_util.tree_map(put, batch)


def host_local_slice(global_len: int) -> slice:
    """The slice of a globally-indexed dataset this host should feed.

    Each host loads only its shard of the ray/frame batch (SURVEY §2.9:
    "per-host data loading").
    """
    n = jax.process_count()
    i = jax.process_index()
    per = global_len // n
    return slice(i * per, (i + 1) * per)
