"""Activation ops with custom gradients."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["trunc_exp"]


@jax.custom_vjp
def trunc_exp(x: jax.Array) -> jax.Array:
    """``exp`` whose gradient clamps the input to ±15 to avoid fp blow-up
    (reference ``modules/radnerfs/utils.py:36-49``). Computed in fp32."""
    return jnp.exp(x.astype(jnp.float32))


def _trunc_exp_fwd(x):
    x32 = x.astype(jnp.float32)
    return jnp.exp(x32), x32


def _trunc_exp_bwd(x32, g):
    return (g * jnp.exp(jnp.clip(x32, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
