"""Pallas lane-packed scatter-add vs oracle (interpret mode on CPU).

The kernel (``ops/pallas_scatter.py``) reproduces the accumulation semantics
of the reference CUDA backward's atomicAdd loop
(``gridencoder/src/gridencoder.cu:248-341``) with OOB-drop parity to
:func:`geneface_tpu.ops.scatter.scatter_add_rows`.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from geneface_tpu.ops.pallas_scatter import (
    pallas_scatter_max_rows,
    scatter_add_rows_pallas,
)
from geneface_tpu.ops.scatter import scatter_add_rows


@pytest.mark.parametrize(
    "M,R,W,chunk",
    [
        (3000, 777, 32, 1024),
        (1024, 100, 16, 512),
        (100, 8, 128, 128),
        (1024, 1024, 64, 512),
    ],
)
def test_pallas_scatter_matches_oracle(M, R, W, chunk):
    rng = np.random.RandomState(M + R)
    rows = rng.randint(-5, R, M).astype(np.int32)  # includes OOB (dropped)
    upd = rng.randn(M, W).astype(np.float32)
    ref = np.asarray(scatter_add_rows(jnp.asarray(rows), jnp.asarray(upd), R))
    got = np.asarray(
        scatter_add_rows_pallas(
            jnp.asarray(rows), jnp.asarray(upd), R, chunk=chunk, interpret=True
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_pallas_scatter_collision_heavy():
    """All updates land on a handful of rows — max accumulation contention."""
    M, R, W = 1500, 4, 32
    rng = np.random.RandomState(0)
    rows = rng.randint(0, R, M).astype(np.int32)
    upd = np.ones((M, W), np.float32)
    got = np.asarray(
        scatter_add_rows_pallas(
            jnp.asarray(rows), jnp.asarray(upd), R, chunk=500, interpret=True
        )
    )
    counts = np.bincount(rows, minlength=R).astype(np.float32)
    np.testing.assert_allclose(got, counts[:, None] * np.ones((R, W)), rtol=1e-6)


def test_budget_guard():
    W = 32
    max_rows = pallas_scatter_max_rows(W)
    assert max_rows >= 8192
    with pytest.raises(AssertionError):
        scatter_add_rows_pallas(
            jnp.zeros((8,), jnp.int32),
            jnp.zeros((8, W), jnp.float32),
            max_rows + 1,
            interpret=True,
        )
