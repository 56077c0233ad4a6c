"""Rotation representations: 6D ↔ rotmat ↔ quaternion ↔ axis-angle.

All functions are shape-polymorphic over leading batch dims, pure, and
jit/vmap/grad-safe (no data-dependent control flow). float32 throughout.

Semantics parity notes:
- `rot6d_to_rotmat` reproduces the Gram-Schmidt construction of the reference
  (reference: scripts/utils.py:190-204): the 6 numbers are read as a (3, 2)
  matrix whose *columns* are the two raw axes, and the output stacks the
  orthonormalized axes as *columns* of the rotation matrix.
- axis-angle (Rodrigues) matches the smplx `batch_rodrigues` convention used by
  the reference's SMPL `pose2rot=True` path (see SURVEY §2b).
- quaternions are (w, x, y, z), unit-normalized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12  # torch F.normalize default eps (reference: scripts/utils.py:201-202)


def _safe_normalize(v: jax.Array, axis: int = -1, eps: float = _EPS) -> jax.Array:
    norm = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(norm, eps)


def rot6d_to_rotmat(x: jax.Array) -> jax.Array:
    """(..., 6) continuous 6D rotation → (..., 3, 3) rotation matrix.

    Zhou et al. CVPR 2019 construction, with the reference's exact data layout
    (reference: scripts/utils.py:198-204): x.reshape(..., 3, 2); column 0 is the
    first raw axis, column 1 the second; output columns are (b1, b2, b1×b2).
    """
    batch_shape = x.shape[:-1]
    m = x.reshape(batch_shape + (3, 2))
    a1 = m[..., 0]
    a2 = m[..., 1]
    b1 = _safe_normalize(a1)
    b2 = _safe_normalize(a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_rot6d(r: jax.Array) -> jax.Array:
    """(..., 3, 3) → (..., 6), inverse layout of `rot6d_to_rotmat`."""
    return r[..., :2].reshape(r.shape[:-2] + (6,))


def axis_angle_to_rotmat(aa: jax.Array) -> jax.Array:
    """Rodrigues: (..., 3) axis-angle → (..., 3, 3).

    Numerically safe at θ→0 (uses the quaternion route, which has no 1/θ).
    """
    return quat_to_rotmat(axis_angle_to_quat(aa))


def axis_angle_to_quat(aa: jax.Array) -> jax.Array:
    """(..., 3) → (..., 4) unit quaternion (w, x, y, z), safe at θ=0."""
    sq = jnp.sum(aa * aa, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(sq, _EPS))
    half = 0.5 * theta
    # sin(θ/2)/θ with a Taylor fallback near zero: 1/2 - θ²/48.
    small = sq < 1e-8
    k = jnp.where(small, 0.5 - sq / 48.0, jnp.sin(half) / theta)
    w = jnp.cos(half)
    xyz = aa * k
    return jnp.concatenate([jnp.where(small, 1.0 - sq / 8.0, w), xyz], axis=-1)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """(..., 4) quaternion (w, x, y, z) → (..., 3, 3). Normalizes the input."""
    q = _safe_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(r: jax.Array) -> jax.Array:
    """(..., 3, 3) → (..., 4) unit quaternion (w, x, y, z), w ≥ 0.

    Branch-free Shepperd-style extraction: computes all four candidate
    constructions and selects the best-conditioned one with `where`, so it is
    grad-safe and vectorizes on the VPU without per-element control flow.
    """
    m00, m01, m02 = r[..., 0, 0], r[..., 0, 1], r[..., 0, 2]
    m10, m11, m12 = r[..., 1, 0], r[..., 1, 1], r[..., 1, 2]
    m20, m21, m22 = r[..., 2, 0], r[..., 2, 1], r[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by 4*q_i^2 >= 0.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    # Pick the candidate with the largest pivot (diagonal term).
    pivots = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 candidates, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    q = _safe_normalize(q)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_to_axis_angle(q: jax.Array) -> jax.Array:
    """(..., 4) unit quaternion → (..., 3) axis-angle, safe at identity."""
    q = _safe_normalize(q)
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)  # w >= 0 → θ in [0, π]
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    xyz = q[..., 1:]
    sin_half_sq = jnp.sum(xyz * xyz, axis=-1, keepdims=True)
    sin_half = jnp.sqrt(jnp.maximum(sin_half_sq, _EPS))
    theta = 2.0 * jnp.arctan2(sin_half, w)
    # θ / sin(θ/2) with Taylor fallback 2 + θ²/12 near zero.
    small = sin_half_sq < 1e-8
    scale = jnp.where(small, 2.0 + sin_half_sq / 1.5, theta / sin_half)
    return xyz * scale


def rotmat_to_axis_angle(r: jax.Array) -> jax.Array:
    """(..., 3, 3) → (..., 3)."""
    return quat_to_axis_angle(rotmat_to_quat(r))


def random_rotmat(key: jax.Array, shape: tuple = ()) -> jax.Array:
    """Uniform random rotations (via random unit quaternions), for tests/benches."""
    q = jax.random.normal(key, shape + (4,))
    return quat_to_rotmat(q)
