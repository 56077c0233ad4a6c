"""Warp-matrix builders and random perturbation generators.

Reproduces the reference's perturbation_helper capabilities
(reference: scripts/perturbation_helper.py:11-210): vec→3×3 builders for
translation / rotation / similarity transforms, and random perturbation
samplers for augmentation. (In the reference only `vec2mat_for_similarity`
is live; the `gen_pert_*` family is dead code that calls a nonexistent
helper — rebuilt working here.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jrr_tpu.data.crop import similarity_vec_to_mat  # re-export for discoverability

__all__ = [
    "similarity_vec_to_mat", "translation_vec_to_mat", "rotation_vec_to_mat",
    "gen_random_perturbation",
]


def translation_vec_to_mat(vec: jax.Array) -> jax.Array:
    """(B, 2) [dx, dy] → (B, 3, 3) (reference: perturbation_helper vec2mat for
    translation)."""
    dx, dy = vec[:, 0], vec[:, 1]
    zero = jnp.zeros_like(dx)
    one = jnp.ones_like(dx)
    return jnp.stack(
        [one, zero, dx, zero, one, dy, zero, zero, one], axis=-1
    ).reshape(-1, 3, 3)


def rotation_vec_to_mat(vec: jax.Array) -> jax.Array:
    """(B, 3) [θ, dx, dy] → (B, 3, 3) = R(θ)·T(dx, dy)
    (reference: scripts/perturbation_helper.py:159-182)."""
    theta, dx, dy = vec[:, 0], vec[:, 1], vec[:, 2]
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    zero = jnp.zeros_like(theta)
    one = jnp.ones_like(theta)
    r = jnp.stack([cos, -sin, zero, sin, cos, zero, zero, zero, one], axis=-1).reshape(-1, 3, 3)
    t = jnp.stack([one, zero, dx, zero, one, dy, zero, zero, one], axis=-1).reshape(-1, 3, 3)
    return r @ t


def gen_random_perturbation(
    key: jax.Array,
    batch: int,
    max_rotation: float = 0.1,
    max_scale_delta: float = 0.1,
    max_translation: float = 0.1,
) -> jax.Array:
    """Random similarity perturbations (B, 3, 3) for warp augmentation."""
    k1, k2, k3 = jax.random.split(key, 3)
    theta = jax.random.uniform(k1, (batch,), minval=-max_rotation, maxval=max_rotation)
    scale = 1.0 + jax.random.uniform(
        k2, (batch, 2), minval=-max_scale_delta, maxval=max_scale_delta
    )
    trans = jax.random.uniform(
        k3, (batch, 2), minval=-max_translation, maxval=max_translation
    )
    vec = jnp.concatenate([theta[:, None], scale, trans], axis=1)
    return similarity_vec_to_mat(vec)
