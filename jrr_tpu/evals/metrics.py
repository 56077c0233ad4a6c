"""MPJPE / PA-MPJPE evaluation metrics.

Reproduces the reference's `evaluate` (reference: scripts/utils.py:117-145):
predictions in meters, targets in millimeters (divided by 1000 internally),
both pelvis-centered at joint 0, per-frame mean joint error, batch mean, ×1000
back to millimeters. Fully jittable; returns per-frame errors too so callers
can aggregate across shards with `psum`/weighted means instead of host syncs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from jrr_tpu.ops import procrustes


class PoseErrors(NamedTuple):
    mpjpe: jax.Array  # scalar, millimeters
    pa_mpjpe: jax.Array  # scalar, millimeters
    per_frame_mpjpe: jax.Array  # (B,), millimeters
    per_frame_pa_mpjpe: jax.Array  # (B,), millimeters


def evaluate(pred_j3d_m: jax.Array, target_j3d_mm: jax.Array) -> PoseErrors:
    """pred in meters (B, J, 3); target in millimeters (B, J, 3)."""
    pred = pred_j3d_m - pred_j3d_m[:, :1]
    target = target_j3d_mm / 1000.0
    target = target - target[:, :1]

    err = jnp.sqrt(jnp.sum((pred - target) ** 2, axis=-1)).mean(axis=-1)  # (B,) meters

    aligned = procrustes.similarity_align(pred, target)
    err_pa = jnp.sqrt(jnp.sum((aligned - target) ** 2, axis=-1)).mean(axis=-1)

    return PoseErrors(
        mpjpe=jnp.mean(err) * 1000.0,
        pa_mpjpe=jnp.mean(err_pa) * 1000.0,
        per_frame_mpjpe=err * 1000.0,
        per_frame_pa_mpjpe=err_pa * 1000.0,
    )
