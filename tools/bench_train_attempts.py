"""Round-5 train-step formulation attempts, measured (VERDICT r4 #2).

(a) one-hot matmul scatter over block-local tables — requires grouping
    updates by destination block, i.e. a sort of the row stream; the sort
    alone was measured at 17-28 ms in round 2 (ops/scatter.py table). Here
    we re-measure the full sorted pipeline with the current toolchain.
(b) batch the two grids' backward scatters into ONE call (pos W=240 +
    ambient W=120 padded, rows offset into a concatenated table) — tests
    whether per-call overhead, not per-row cost, is on the floor.
(c) update_extra_state cost → its amortized share of the step (it runs
    every 16 steps inside the timed bench loop).

Each prints a measured verdict line for docs/perf_notes.md.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from tools.tpu_timeit import device_time


def main():
    M = 393_216  # bucket-6 sample capacity at 65,536 rays
    R_pos, W_pos = 8192, 240
    R_amb, W_amb = 8192, 120
    rng = np.random.RandomState(0)
    rows_p = jnp.asarray(rng.randint(0, R_pos, M), jnp.int32)
    rows_a = jnp.asarray(rng.randint(0, R_amb, M), jnp.int32)
    upd_p = jnp.asarray(rng.randn(M, W_pos), jnp.float32)
    upd_a = jnp.asarray(rng.randn(M, W_amb), jnp.float32)

    from geneface_tpu.ops.scatter import scatter_add_rows

    def sep(i, rp, ra, up, ua):
        up = up * (1 + i.astype(jnp.float32) * 1e-12)
        return (
            scatter_add_rows(rp, up, R_pos),
            scatter_add_rows(ra, ua, R_amb),
        )

    t_sep = device_time(sep, rows_p, rows_a, upd_p, upd_a, iters=5)
    print(f"(b) separate scatters (240w + 120w): {t_sep*1e3:.2f} ms")

    def comb(i, rp, ra, up, ua):
        up = up * (1 + i.astype(jnp.float32) * 1e-12)
        ua_pad = jnp.pad(ua, ((0, 0), (0, W_pos - W_amb)))
        rows = jnp.concatenate([rp, ra + R_pos])
        upd = jnp.concatenate([up, ua_pad], axis=0)
        return scatter_add_rows(rows, upd, R_pos + R_amb)

    t_comb = device_time(comb, rows_p, rows_a, upd_p, upd_a, iters=5)
    print(f"(b) combined single scatter (2M rows, 240w): {t_comb*1e3:.2f} ms"
          f"  -> {'WIN' if t_comb < t_sep * 0.95 else 'no win'}")

    # (a) sorted pipeline: argsort rows, gather updates by the permutation,
    # scatter with sorted indices (XLA can exploit indices_are_sorted)
    def sorted_scatter(i, rp, up):
        up = up * (1 + i.astype(jnp.float32) * 1e-12)
        order = jnp.argsort(rp)
        rs = rp[order]
        us = up[order]
        out = jnp.zeros((R_pos, W_pos), jnp.float32)
        return jax.lax.scatter_add(
            out, rs[:, None], us,
            jax.lax.ScatterDimensionNumbers(
                update_window_dims=(1,),
                inserted_window_dims=(0,),
                scatter_dims_to_operand_dims=(0,),
            ),
            indices_are_sorted=True, unique_indices=False,
        )

    t_sorted = device_time(sorted_scatter, rows_p, upd_p, iters=5)
    print(f"(a) argsort+sorted-scatter (240w): {t_sorted*1e3:.2f} ms "
          f"(vs plain {device_time(lambda i, r, u: scatter_add_rows(r, u * (1 + i.astype(jnp.float32) * 1e-12), R_pos), rows_p, upd_p, iters=5)*1e3:.2f} ms)")

    # (a') block-local one-hot matmul after sorting: bucket rows into
    # R/64-row blocks; within a sorted stream each 4096-update tile touches
    # few blocks... measure just the one-hot matmul at block scale to bound
    # the best case: [M, 64] one-hot @ tile-local updates.
    B = 64  # rows per block

    def onehot_block(i, rp, up):
        up = up * (1 + i.astype(jnp.float32) * 1e-12)
        local = (rp % B)[:, None]
        onehot = (
            local == jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
        ).astype(jnp.float32)  # [M, 64]
        # best case: every update lands in ONE known block -> a single
        # [64, M] @ [M, 240] matmul (real case needs this per touched block)
        return jax.lax.dot_general(
            onehot, up, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    t_oh = device_time(onehot_block, rows_p, upd_p, iters=5)
    print(f"(a) one-hot matmul LOWER BOUND (single 64-row block): "
          f"{t_oh*1e3:.2f} ms — real case multiplies by touched blocks")

    # (c) update_extra_state cost at production shape
    from bench import production_cfg, trained_grid_occ
    from geneface_tpu.data.radnerf_dataset import RADNeRFDataset, get_cond_window
    from geneface_tpu.models.radnerf.renderer import update_extra_state
    from geneface_tpu.tasks.radnerf import model_from_cfg

    with tempfile.TemporaryDirectory(prefix="gf_bta_") as tmp:
        from tools.make_synthetic_dataset import make_dataset

        make_dataset(tmp, n_frames=2, hw=64)
        cfg = production_cfg(tmp)
        model = model_from_cfg(cfg)
        ds = RADNeRFDataset("train", tmp, cfg, training=True)
        cond = jnp.asarray(get_cond_window(ds.conds, 0, cfg["smo_win_size"]))
        params = model.init(
            jax.random.PRNGKey(0), cond, jnp.zeros((8, 3)), jnp.zeros((8, 3)),
            method=model.init_all,
        )
        occ = trained_grid_occ(cfg)
        cond_feat = model.apply(params, cond, method=model.cal_cond_feat)

        def occ_up(i, dg, og, md, r):
            def density_fn(x):
                return model.apply(
                    params, x, cond_feat, method=model.density
                )["sigma"]

            from geneface_tpu.models.radnerf.renderer import OccupancyState

            o = OccupancyState(dg * (1 + i.astype(jnp.float32) * 1e-12), og, md)
            out = update_extra_state(
                density_fn, o, jax.random.PRNGKey(0),
                grid_size=int(cfg["grid_size"]), bound=1.0,
                density_thresh=float(cfg["density_thresh"]),
            )
            return out.density_grid

        t_occ = device_time(
            occ_up, occ.density_grid, occ.occ_grid, occ.mean_density,
            jnp.float32(0), iters=3,
        )
        print(f"(c) update_extra_state: {t_occ*1e3:.2f} ms "
              f"-> amortized {t_occ*1e3/16:.2f} ms/step at interval 16")


if __name__ == "__main__":
    main()
