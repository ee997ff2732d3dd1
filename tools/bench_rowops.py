"""Microbenchmark: row gather / scatter-add cost vs table size R and width W.

Drives the grid-encoder redesign: gathers and scatters are priced per ROW
on TPU (ops/scatter.py header); this tool maps the cost surface so the
level-grouping (wider rows, fewer indices) trade can be sized. Run on the
real chip: ``python tools/bench_rowops.py``.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from tools.tpu_timeit import device_time


def main():
    M = int(os.environ.get("GF_M", 524288))
    rows_list = [int(r) for r in os.environ.get(
        "GF_ROWS", "4096,16384,39304,287496,2197152"
    ).split(",")]
    widths = [int(w) for w in os.environ.get("GF_WIDTHS", "32,64,128").split(",")]
    key = jax.random.PRNGKey(0)

    print(f"M={M} updates/rows gathered; times in ms, per-row ns in ()")
    print(f"{'':>10} " + " ".join(f"W={w:<14}" for w in widths))

    for R in rows_list:
        row_idx = jax.random.randint(key, (M,), 0, R)
        line_s, line_g = [], []
        for W in widths:
            upd = jax.random.normal(key, (M, W), jnp.float32)
            table = jax.random.normal(key, (R, W), jnp.bfloat16)

            def scat(i, row_idx, upd):
                u = upd * (1.0 + i.astype(jnp.float32) * 1e-12)
                return (
                    jnp.zeros((R, W), jnp.float32)
                    .at[row_idx]
                    .add(u, mode="drop")
                )

            def gath(i, row_idx, table):
                r = jnp.minimum(row_idx + i, R - 1)
                return table[r].astype(jnp.float32).sum(axis=-1)

            ts = device_time(scat, row_idx, upd, iters=5)
            tg = device_time(gath, row_idx, table, iters=5)
            line_s.append(f"{ts*1e3:6.2f} ({ts/M*1e9:4.1f})")
            line_g.append(f"{tg*1e3:6.2f} ({tg/M*1e9:4.1f})")
        print(f"R={R:<8} scatter " + "  ".join(line_s), flush=True)
        print(f"{'':>10} gather  " + "  ".join(line_g), flush=True)


if __name__ == "__main__":
    main()
