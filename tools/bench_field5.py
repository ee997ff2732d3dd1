"""Incremental field fwd+bwd bisect: find where the time goes between the
isolated encoder benches and the full model apply."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from tools.tpu_timeit import device_time


def main():
    M = int(os.environ.get("GF_M", 393216))
    from geneface_tpu.models.radnerf import RADNeRF

    model = RADNeRF(
        grid_compute_dtype=os.environ.get("GF_GRID_DTYPE", "f32")
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((5, 1, 204)), jnp.zeros((4, 3)),
        jnp.ones((4, 3)) / 1.733, method=model.init_all,
    )
    bound = model.bind(params)
    xyz = jax.random.uniform(jax.random.PRNGKey(2), (M, 3), minval=-0.5, maxval=0.5)
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (M, 1))
    cond_feat = jnp.zeros((1, 64))
    ind = params["params"]["individual_embeddings"][0]

    def t(name, fn, *args, iters=5):
        dt = device_time(fn, *args, iters=iters)
        print(f"{name:30s} {dt*1e3:8.2f} ms", flush=True)

    def grad_of(apply_fn):
        def run(i, params, xyz):
            x = xyz * (1 + i.astype(jnp.float32) * 1e-12)
            return jax.grad(lambda p: apply_fn(p, x))(params)
        return run

    from geneface_tpu.ops import sh_encode, trunc_exp
    from geneface_tpu.ops.fused_grid import fused_grid_encode

    def posenc_only(p, x):
        x01 = (x + 1.0) / 2.0
        pf = fused_grid_encode(
            x01, p["params"]["pos_embeddings"], bound.pos_fused_meta, False
        )
        return jnp.sum(pf)

    def amb_mlp(p, x):
        x01 = (x + 1.0) / 2.0
        pf = fused_grid_encode(
            x01, p["params"]["pos_embeddings"], bound.pos_fused_meta, False
        )
        logit = model.apply(
            p, [pf, cond_feat], method=lambda m, h: m.ambient_net(h)
        )
        return jnp.sum(jnp.tanh(logit.astype(jnp.float32))) + jnp.sum(pf)

    def amb_full(p, x):
        x01 = (x + 1.0) / 2.0
        pf = fused_grid_encode(
            x01, p["params"]["pos_embeddings"], bound.pos_fused_meta, False
        )
        logit = model.apply(
            p, [pf, cond_feat], method=lambda m, h: m.ambient_net(h)
        )
        amb = jnp.tanh(logit.astype(jnp.float32))
        af = fused_grid_encode(
            (amb + 1) / 2, p["params"]["ambient_embeddings"],
            bound.ambient_fused_meta, True,
        )
        return jnp.sum(af) + jnp.sum(pf)

    def amb_full_nograd(p, x):
        x01 = (x + 1.0) / 2.0
        pf = fused_grid_encode(
            x01, p["params"]["pos_embeddings"], bound.pos_fused_meta, False
        )
        logit = model.apply(
            p, [pf, cond_feat], method=lambda m, h: m.ambient_net(h)
        )
        amb = jnp.tanh(logit.astype(jnp.float32))
        af = fused_grid_encode(
            jax.lax.stop_gradient((amb + 1) / 2),
            p["params"]["ambient_embeddings"], bound.ambient_fused_meta, False,
        )
        return jnp.sum(af) + jnp.sum(pf) + jnp.sum(amb)

    def plus_sigma(p, x):
        x01 = (x + 1.0) / 2.0
        pf = fused_grid_encode(
            x01, p["params"]["pos_embeddings"], bound.pos_fused_meta, False
        )
        logit = model.apply(
            p, [pf, cond_feat], method=lambda m, h: m.ambient_net(h)
        )
        amb = jnp.tanh(logit.astype(jnp.float32))
        af = fused_grid_encode(
            (amb + 1) / 2, p["params"]["ambient_embeddings"],
            bound.ambient_fused_meta, True,
        )
        sig, geo = model.apply(
            p, [pf, af], method=lambda m, h: m.sigma_net(h)
        )
        return jnp.sum(trunc_exp(sig[..., 0])) + jnp.sum(geo) * 1e-6

    def full(p, x):
        s, rgb, amb = model.apply(p, x, dirs, cond_feat, ind)
        return jnp.sum(s) + jnp.sum(rgb) + jnp.sum(amb)

    t("posenc f+b", grad_of(posenc_only), params, xyz)
    t("+amb MLP+tanh f+b", grad_of(amb_mlp), params, xyz)
    t("+amb enc (no in-grad) f+b", grad_of(amb_full_nograd), params, xyz)
    t("+amb enc (in-grad) f+b", grad_of(amb_full), params, xyz)
    t("+sigma net f+b", grad_of(plus_sigma), params, xyz)
    t("full field f+b", grad_of(full), params, xyz)


if __name__ == "__main__":
    main()
