"""Reliable device-time measurement through the high-latency TPU tunnel.

The naive ``block_until_ready`` pattern is untrustworthy here: the tunnel's
D2H roundtrip is ~28 ms and, worse, readiness signalling can decouple from
device completion, yielding physically impossible sub-bandwidth-floor
timings. This harness instead runs the op ``iters`` times inside an
on-device ``fori_loop`` (the loop index is mixed into the computation so XLA
cannot hoist the body) and cancels all fixed overhead (dispatch, transfer,
roundtrip) by differencing a 2N-iteration run against an N-iteration run.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["device_time"]


def _runner(step, iters):
    @jax.jit
    def run(args):
        def body(i, acc):
            out = step(i, *args)
            leaves = jax.tree_util.tree_leaves(out)
            s = jnp.float32(0.0)
            for leaf in leaves:
                # consume EVERY element: reducing only a slice lets XLA
                # dead-code-eliminate the untouched rows of gather-based
                # computations (measured: a 13.9 ms grid encode "ran" in
                # 1.7 ms when only out[0, 0] was consumed). The full-leaf
                # reduction adds one read of the output (~0.3 ms at 134 MB)
                # — included in what the subtraction harness cancels only if
                # both runs share it, which they do.
                s = s + jnp.sum(leaf.astype(jnp.float32))
            return acc + s

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    return run


def device_time(step, *args, iters: int = 10, repeats: int = 3) -> float:
    """Median pure-device seconds per call of ``step(i, *args)``.

    ``step`` MUST use its first argument (the loop index) to perturb the
    computation — e.g. scale an input by ``1 + i * 1e-12`` — otherwise XLA
    hoists the body out of the loop and the measurement collapses.
    """
    run_n = _runner(step, iters)
    run_2n = _runner(step, 2 * iters)
    # compile + warm
    float(run_n(args))
    float(run_2n(args))
    diffs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run_n(args))
        t1 = time.perf_counter()
        float(run_2n(args))
        t2 = time.perf_counter()
        diffs.append((t2 - t1) - (t1 - t0))
    diffs.sort()
    return diffs[len(diffs) // 2] / iters
