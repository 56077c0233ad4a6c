"""Bounding-box crop and camera-intrinsics bookkeeping.

Reproduces the reference's crop math exactly
(reference: scripts/data.py:220-271 `find_crop`, :385-449
`crop_intrinsics`/`resize_intrinsics`, scripts/perturbation_helper.py:185-210
`vec2mat_for_similarity`): the bbox is normalized to [-1, 1] over the 1000²
frame, turned into a square similarity transform, and the image is warped with
a differentiable bilinear sampler; the pinhole intrinsics are updated for the
crop + resize so 3D↔2D geometry stays consistent.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from jrr_tpu import constants
from jrr_tpu.ops import sampling


def similarity_vec_to_mat(vec: jax.Array) -> jax.Array:
    """(B, 5) [θ, sx, sy, dx, dy] → (B, 3, 3) = R(θ)·S(sx, sy)·T(dx, dy)
    (reference: scripts/perturbation_helper.py:185-210)."""
    theta, sx, sy, dx, dy = (vec[:, i] for i in range(5))
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    zero = jnp.zeros_like(theta)
    one = jnp.ones_like(theta)
    r = jnp.stack(
        [cos, -sin, zero, sin, cos, zero, zero, zero, one], axis=-1
    ).reshape(-1, 3, 3)
    s = jnp.stack([sx, zero, zero, zero, sy, zero, zero, zero, one], axis=-1).reshape(
        -1, 3, 3
    )
    t = jnp.stack([one, zero, dx, zero, one, dy, zero, zero, one], axis=-1).reshape(
        -1, 3, 3
    )
    return r @ s @ t


def crop_intrinsics(
    intrinsics: jax.Array, height: jax.Array, width: jax.Array,
    crop_ci: jax.Array, crop_cj: jax.Array,
) -> jax.Array:
    """Principal-point update for a crop window (reference: scripts/data.py:385-410)."""
    intrinsics = jnp.asarray(intrinsics)
    x0 = intrinsics[:, 0, 2]
    y0 = intrinsics[:, 1, 2]
    cx = x0 + (width - 1) / 2 - crop_cj
    cy = y0 + (height - 1) / 2 - crop_ci
    out = intrinsics.at[:, 0, 2].set(cx)
    return out.at[:, 1, 2].set(cy)


def resize_intrinsics(
    intrinsics: jax.Array, height: jax.Array, width: jax.Array, scale: jax.Array
) -> jax.Array:
    """Focal/principal update for a resize (reference: scripts/data.py:413-449)."""
    intrinsics = jnp.asarray(intrinsics)
    x0 = intrinsics[:, 0, 2]
    y0 = intrinsics[:, 1, 2]
    fx = intrinsics[:, 0, 0]
    fy = intrinsics[:, 1, 1]
    center_x = (width - 1) / 2
    center_y = (height - 1) / 2
    new_h = scale * height
    new_w = scale * width
    cx = (new_w - 1) / 2 + scale * (x0 - center_x)
    cy = (new_h - 1) / 2 + scale * (y0 - center_y)
    out = intrinsics.at[:, 0, 2].set(cx)
    out = out.at[:, 1, 2].set(cy)
    out = out.at[:, 0, 0].set(scale * fx)
    return out.at[:, 1, 1].set(scale * fy)


class CropResult(NamedTuple):
    image: jax.Array  # (B, C, img_size, img_size)
    min_x: jax.Array  # (B,) crop origin in source pixels
    min_y: jax.Array  # (B,)
    scale: jax.Array  # (B,) half-extent in normalized units
    intrinsics: jax.Array  # (B, 3, 3) updated for the crop+resize


def find_crop(
    image: jax.Array,  # (B, C, H, W), H = W = 1000
    bbox: jax.Array,  # (B, 4) = (min_y, min_x, max_y, max_x) source pixels
    intrinsics: jax.Array,  # (B, 3, 3)
    img_size: int = constants.IMAGE_CROP_RES,
    mode: str = "bilinear",
    key: Optional[jax.Array] = None,
) -> CropResult:
    """Square crop around the bbox, warped to img_size²
    (reference: scripts/data.py:220-271; bbox layout per :223-226)."""
    image = jnp.asarray(image)
    bbox = jnp.asarray(bbox)
    half = constants.IMG_RES / 2.0
    min_x = (bbox[:, 1] - half) / half
    max_x = (bbox[:, 3] - half) / half
    min_y = (bbox[:, 0] - half) / half
    max_y = (bbox[:, 2] - half) / half

    avg_x = (min_x + max_x) / 2
    avg_y = (min_y + max_y) / 2
    scale = jnp.maximum(max_x - min_x, max_y - min_y) / 2

    vec = jnp.stack(
        [jnp.zeros_like(scale), scale, scale, avg_x / scale, avg_y / scale], axis=1
    )
    mat = similarity_vec_to_mat(vec)
    warped = sampling.warp_image(image, mat, (img_size, img_size), mode=mode, key=key)

    avg_x_px = avg_x * half + half
    avg_y_px = avg_y * half + half
    out_min_x = (avg_x - scale) * half + half
    out_min_y = (avg_y - scale) * half + half

    side = constants.IMG_RES * scale
    new_intr = crop_intrinsics(intrinsics, side, side, avg_y_px, avg_x_px)
    new_intr = resize_intrinsics(new_intr, side, side, img_size / (scale * constants.IMG_RES))

    return CropResult(
        image=warped, min_x=out_min_x, min_y=out_min_y, scale=scale, intrinsics=new_intr
    )


def reposition_j2d(
    gt_j2d: jax.Array, min_x: jax.Array, min_y: jax.Array, scale: jax.Array,
    crop_res: int = constants.CROP_RES,
) -> jax.Array:
    """Source-frame 2D joints → crop pixel coords
    (reference: scripts/data.py:134-138)."""
    x = (gt_j2d[..., 0] - min_x[..., None]) / scale[..., None] / (
        constants.IMG_RES / crop_res
    )
    y = (gt_j2d[..., 1] - min_y[..., None]) / scale[..., None] / (
        constants.IMG_RES / crop_res
    )
    return jnp.stack([x, y], axis=-1)
