"""Joint-regressor application and constraint semantics.

Reproduces the reference's central primitive `find_joints`
(reference: scripts/utils.py:85-103): the trainable (17, 6890) regressor is
masked, passed through ReLU, row-normalized to a row-stochastic matrix, and
applied to SMPL vertices as a dense matmul. On TPU the (17, 6890) x (B, 6890, 3)
contraction is a single small MXU matmul — sparsity is not worth exploiting
(SURVEY §2b).

Known reference quirk, preserved deliberately: `find_j_reg_mask` returns
all-ones (reference: scripts/utils.py:182-187 sets both branches to ones), so
the "keep zeros zero" sparsity constraint is inert; the effective constraint is
ReLU + row normalization. We implement the *intended* mask too and make the
choice explicit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NORM_EPS = 0.0  # reference divides by the raw row sum with no epsilon


def jreg_mask(j_reg: jax.Array, intended: bool = False) -> jax.Array:
    """Zero-pattern mask for the regressor.

    intended=False reproduces the reference bug (all-ones mask,
    scripts/utils.py:182-187); intended=True returns the actual zero-pattern
    mask the code meant to build (1 where j_reg != 0).
    """
    if not intended:
        return jnp.ones_like(j_reg)
    return jnp.where(j_reg == 0, 0.0, 1.0)


def normalize_jreg(j_reg: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
    """mask → ReLU → row-normalize (reference: scripts/utils.py:87-92).

    Rows that sum to zero would divide by zero in the reference; we keep that
    behavior under default settings (parity) — callers training the regressor
    should keep rows positive (ReLU guarantees nonneg; Adam init from a valid
    regressor keeps sums > 0 in practice).
    """
    if mask is not None:
        j_reg = j_reg * mask
    j_reg = jax.nn.relu(j_reg)
    row_sum = jnp.sum(j_reg, axis=1, keepdims=True)
    return j_reg / (row_sum + _NORM_EPS)


def apply_jreg(j_reg_normalized: jax.Array, vertices: jax.Array) -> jax.Array:
    """(J, V) row-stochastic regressor × (B, V, 3) vertices → (B, J, 3) joints.

    Leading regressor axes broadcast: a stacked (K, J, V) input yields
    (K, B, J, 3) — the eval harness scores several regressors (initial /
    retrained / lstsq) on ONE set of vertices this way, so a consumer's
    network trunk runs once, not once per regressor."""
    return jnp.einsum(
        "...jv,bvc->...bjc",
        j_reg_normalized,
        vertices,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def find_joints(
    j_reg: jax.Array,
    vertices: jax.Array,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Full reference `find_joints` semantics given precomputed vertices."""
    return apply_jreg(normalize_jreg(j_reg, mask), vertices)


def move_pelvis(j3ds: jax.Array) -> jax.Array:
    """Root-center joints at joint 0 (reference: scripts/utils.py:106-114)."""
    return j3ds - j3ds[..., :1, :]
