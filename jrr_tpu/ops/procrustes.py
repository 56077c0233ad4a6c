"""Batched orthogonal Procrustes (similarity-transform) alignment.

Reproduces `batch_compute_similarity_transform_torch`
(reference: scripts/eval_utils.py:7-58) as a pure-XLA batched computation:
the 3×3 SVDs batch onto the TPU fine via `jnp.linalg.svd` (SURVEY §2b).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def similarity_align(s1: jax.Array, s2: jax.Array) -> jax.Array:
    """Align s1 to s2 with the best scale+rotation+translation.

    s1, s2: (B, N, 3) point sets (the reference auto-transposes from (B, N, 3)
    to (B, 3, N); we take the (B, N, 3) convention directly).
    Returns s1_hat: (B, N, 3), s1 mapped by the optimal similarity transform.
    """
    x1 = jnp.swapaxes(s1, -1, -2)  # (B, 3, N)
    x2 = jnp.swapaxes(s2, -1, -2)

    mu1 = jnp.mean(x1, axis=-1, keepdims=True)
    mu2 = jnp.mean(x2, axis=-1, keepdims=True)
    x1c = x1 - mu1
    x2c = x2 - mu2

    var1 = jnp.sum(x1c**2, axis=(-1, -2))

    k = jnp.einsum(
        "bin,bjn->bij", x1c, x2c, precision=jax.lax.Precision.HIGHEST
    )  # (B, 3, 3)

    u, _, vh = jnp.linalg.svd(k)
    v = jnp.swapaxes(vh, -1, -2)

    # Fix reflection: det(U Vᵀ) sign into the last singular vector
    # (reference: scripts/eval_utils.py:39-44).
    det = jnp.linalg.det(jnp.einsum("bij,bkj->bik", u, v))
    d = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), jnp.sign(det)], axis=-1)
    r = jnp.einsum("bij,bj,bkj->bik", v, d, u)  # V diag(d) Uᵀ

    rk = jnp.einsum("bij,bjk->bik", r, k)
    scale = jnp.trace(rk, axis1=-2, axis2=-1) / var1

    t = mu2 - scale[..., None, None] * jnp.einsum("bij,bjn->bin", r, mu1)

    s1_hat = scale[..., None, None] * jnp.einsum("bij,bjn->bin", r, x1) + t
    return jnp.swapaxes(s1_hat, -1, -2)
