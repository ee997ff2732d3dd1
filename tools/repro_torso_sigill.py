"""Bisect the torso-field TPU compiler SIGILL (round 5).

Stages of forward_torso compiled separately at N=262144 to find which
subgraph triggers the TpuPriorityFusionQueue crash.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from bench import production_cfg
    from geneface_tpu.models.radnerf import RADNeRFTorso
    from geneface_tpu.ops import freq_encode
    from geneface_tpu.tasks.radnerf import model_from_cfg
    from tools.make_synthetic_dataset import make_dataset

    N = int(os.environ.get("GF_N", 262144))
    with tempfile.TemporaryDirectory(prefix="gf_sig_") as tmp:
        make_dataset(tmp, n_frames=2, hw=64)
        cfg = production_cfg(tmp)
        cfg["grid_compute_dtype"] = "bf16"
        from geneface_tpu.data.radnerf_dataset import (
            RADNeRFDataset,
            get_cond_window,
        )

        model = model_from_cfg(cfg, RADNeRFTorso)
        ds = RADNeRFDataset("train", tmp, cfg, training=True)
        cond = jnp.asarray(get_cond_window(ds.conds, 0, cfg["smo_win_size"]))
        params = model.init(
            jax.random.PRNGKey(0), cond, jnp.zeros((8, 3)), jnp.zeros((8, 3)),
            method=model.init_all,
        )
        xy = jnp.asarray(
            np.random.RandomState(0).uniform(-1, 1, (N, 2)).astype(np.float32)
        )
        pose6 = jnp.zeros((1, 6))
        t_ind = params["params"]["torso_individual_codes"][0]

        def report(name, fn, *args):
            try:
                out = jax.block_until_ready(jax.jit(fn)(*args))
                print(f"OK   {name}: {jax.tree_util.tree_map(lambda a: a.shape, out)}",
                      flush=True)
            except Exception as e:
                print(f"FAIL {name}: {type(e).__name__} {str(e)[:200]}", flush=True)

        report("freq_encode xy deg10", lambda x: freq_encode(x, degree=10), xy)
        report(
            "freq both + concat",
            lambda x: jnp.concatenate(
                [
                    freq_encode(x * 0.8, degree=10),
                    jnp.broadcast_to(freq_encode(pose6, degree=4), (N, 54)),
                    jnp.broadcast_to(t_ind.reshape(1, -1), (N, 8)),
                ],
                axis=-1,
            ),
            xy,
        )

        def deform_part(x):
            h = jnp.concatenate(
                [
                    freq_encode(x * 0.8, degree=10),
                    jnp.broadcast_to(freq_encode(pose6, degree=4), (N, 54)),
                    jnp.broadcast_to(t_ind.reshape(1, -1), (N, 8)),
                ],
                axis=-1,
            )
            return model.apply(
                params,
                h,
                method=lambda m, hh: m.torso_deform_net(hh),
            )

        report("deform net", deform_part, xy)

        def grid_part(x):
            dx = deform_part(x)
            x_def = jnp.clip(x * 0.8 + dx, -1.0, 1.0)
            return model.apply(
                params,
                (x_def + 1.0) / 2.0,
                method=lambda m, xx: m._encode_grid(
                    xx, m.torso_embeddings, m.torso_grid_meta,
                    m.torso_block_meta, m.torso_fused_meta,
                ),
            )

        report("deform + grid encode", grid_part, xy)

        def full(x):
            return model.apply(
                params, x, pose6, t_ind, None, None,
                method=model.forward_torso,
            )

        report("full forward_torso", full, xy)


if __name__ == "__main__":
    main()
