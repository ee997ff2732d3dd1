"""Locally-linear-embedding projection onto the GT landmark manifold.

jnp re-implementation of ``modules/postnet/lle.py``: k-NN search in feature
space (``find_k_nearest_neighbors:8-28``) followed by the constrained
least-squares LLE weights solve (``solve_LLE_projection_batch:30-80``),
used at NeRF inference time to pull predicted landmarks toward the training
distribution (``inference/nerfs/lm3d_nerf_infer.py:71-76``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["find_k_nearest_neighbors", "solve_lle_projection", "compute_lle_projection"]


def find_k_nearest_neighbors(feats, feat_database, K: int = 10):
    """feats [N, C], database [M, C] → indices [N, K] of nearest rows."""
    d2 = (
        jnp.sum(feats**2, -1, keepdims=True)
        + jnp.sum(feat_database**2, -1)[None, :]
        - 2.0 * feats @ feat_database.T
    )
    _, idx = jax.lax.top_k(-d2, K)
    return idx


def solve_lle_projection(feat, feat_base):
    """feat [N, C], feat_base [N, K, C] → (feat_fuse [N, C], weights [N, K]).

    Solves ``min ||feat - Σ w_i base_i||`` s.t. ``Σ w_i = 1`` via the
    affine-combination reduction (``lle.py:30-80``).
    """
    N, K, C = feat_base.shape
    if K == 1:
        return feat_base[:, 0], jnp.ones((N, 1), feat.dtype)
    B = feat - feat_base[:, 0, :]  # [N, C]
    A = (feat_base[:, 1:, :] - feat_base[:, 0:1, :]).transpose(0, 2, 1)  # [N,C,K-1]
    AT = A.transpose(0, 2, 1)
    ATA = AT @ A  # [N, K-1, K-1]
    # ridge scaled by the Gram trace: exact-duplicate neighbors (common when
    # K approaches the database size) make ATA singular and a fixed 1e-8
    # still yields nan in f32; the relative ridge keeps the solve finite
    # with negligible bias on well-conditioned neighborhoods
    tr = jnp.trace(ATA, axis1=-2, axis2=-1)[:, None, None]
    ATA = ATA + (1e-6 * tr / (K - 1) + 1e-8) * jnp.eye(K - 1)[None]
    X = jnp.linalg.solve(ATA, AT @ B[..., None])[..., 0]  # [N, K-1]
    w0 = 1.0 - jnp.sum(X, axis=-1, keepdims=True)
    weights = jnp.concatenate([w0, X], axis=-1)  # [N, K]
    feat_fuse = jnp.einsum("nk,nkc->nc", weights, feat_base)
    return feat_fuse, weights


def compute_lle_projection(feats, feat_database, K: int = 10):
    """→ (feat_fuse [N, C], weights [N, K])."""
    idx = find_k_nearest_neighbors(feats, feat_database, K)
    feat_base = feat_database[idx]  # [N, K, C]
    return solve_lle_projection(feats, feat_base)
