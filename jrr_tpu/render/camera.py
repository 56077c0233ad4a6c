"""Perspective camera: SMPL frame → NDC → screen.

Reproduces the conventions of the reference's projection path
(reference: scripts/renderer.py:10-51 via pytorch3d==0.3.0 PerspectiveCameras):

- points are first converted from the SMPL frame to the camera frame by
  negating x, y and doubling all coordinates
  (reference: scripts/renderer.py:35-37, scripts/optimize.py:80-82);
- view transform is a pure translation by the per-frame camera vector T
  (R = I; reference: scripts/renderer.py:39-40);
- NDC: x_ndc = f·x/z + px with f = 5000/image_size, p = 0 (+X left, +Y up,
  +Z into the screen);
- screen: x_screen = (W−1)/2 · (1 − x_ndc) — the pytorch3d 0.3.0 formula
  (newer pytorch3d uses W/2; the reference pins 0.3.0 in requirements.txt:10).

The weak-perspective camera output of SPIN (s, tx, ty) is converted to a
camera translation exactly as the reference does
(reference: scripts/optimize.py:170-173).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jrr_tpu import constants

SMPL_TO_CAM_FLIP_SCALE = jnp.asarray([-2.0, -2.0, 2.0], dtype=jnp.float32)


def smpl_to_camera_frame(points: jax.Array) -> jax.Array:
    """(..., 3) SMPL-frame points → pytorch3d-convention camera-frame points."""
    return points * SMPL_TO_CAM_FLIP_SCALE


def weak_perspective_to_translation(
    pred_camera: jax.Array, image_size: int = constants.CROP_RES
) -> jax.Array:
    """SPIN weak-perspective (s, tx, ty) → camera translation T (B, 3).

    reference: scripts/optimize.py:170-173 (image_size=224 in the optimize
    path; scripts/test.py:100-102 uses 256 — pass it explicitly).
    """
    s, tx, ty = pred_camera[:, 0], pred_camera[:, 1], pred_camera[:, 2]
    tz = 2.0 * constants.FOCAL_LENGTH / (image_size * s + 1e-9)
    return jnp.stack([-2.0 * tx, -2.0 * ty, tz], axis=-1)


def project_to_ndc(
    points_cam: jax.Array,
    cam_t: jax.Array,
    focal_ndc: float,
    principal_ndc: jax.Array | float = 0.0,
) -> jax.Array:
    """Camera-frame points (B, N, 3) + translation (B, 3) → NDC (B, N, 3).

    Returns (x_ndc, y_ndc, z_view); z is passed through (pytorch3d returns the
    unprojected depth in screen outputs' z slot as 1/z in K, but the reference
    only consumes x, y — we keep raw view z, which is also what the rasterizer
    needs for culling).
    """
    p = points_cam + cam_t[:, None, :]
    z = p[..., 2:3]
    xy_ndc = focal_ndc * p[..., :2] / z + principal_ndc
    return jnp.concatenate([xy_ndc, z], axis=-1)


def ndc_to_screen(ndc: jax.Array, image_size: int) -> jax.Array:
    """(..., 3) NDC → screen pixels, pytorch3d 0.3.0: (S−1)/2 · (1 − ndc)."""
    half = (image_size - 1.0) / 2.0
    xy = half * (1.0 - ndc[..., :2])
    return jnp.concatenate([xy, ndc[..., 2:]], axis=-1)


def project_points_screen(
    points_smpl: jax.Array,
    cam_t: jax.Array,
    image_size: int = constants.CROP_RES,
    focal_length: float = constants.FOCAL_LENGTH,
) -> jax.Array:
    """Full reference projection chain: SMPL-frame points → screen coords.

    Equivalent to `return_2d_joints`'s camera math given precomputed 3D points
    (reference: scripts/renderer.py:35-51).
    """
    cam_pts = smpl_to_camera_frame(points_smpl)
    ndc = project_to_ndc(cam_pts, cam_t, focal_length / image_size)
    return ndc_to_screen(ndc, image_size)
