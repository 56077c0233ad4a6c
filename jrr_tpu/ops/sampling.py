"""Differentiable image sampling: bilinear and linearized multi-sampling.

Re-implements the reference's warping stack
(reference: scripts/sampling_helper.py:5-69, scripts/linearized.py:88-287):

- `grid_sample`: torch.nn.functional.grid_sample semantics for mode='bilinear',
  padding='zeros', align_corners=False — grid coords in [-1, 1],
  pixel = ((g + 1) * size − 1) / 2, zero padding outside. Implemented as a
  vectorized gather (XLA lowers it to efficient dynamic-slices/gathers).
- mode='linearized': Jiang et al., "Linearized Multi-Sampling for
  Differentiable Image Transformation" (ICCV 2019) — the value is the plain
  bilinear sample, but its *gradient* w.r.t. the grid comes from a local
  least-squares linear fit over auxiliary noise-jittered samples
  (reference: scripts/linearized.py:141-286). Live-but-unused in the
  reference's hot path (only 'bilinear' is exercised, scripts/data.py:252);
  provided for capability parity.
- `warp_image`: homography warp (build grid from an output-shape mesh, apply
  the 3×3 transform with perspective divide, sample)
  (reference: scripts/sampling_helper.py:15-69).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _unnormalize(coord: jax.Array, size: int) -> jax.Array:
    """[-1, 1] grid coordinate → pixel coordinate, align_corners=False."""
    return ((coord + 1.0) * size - 1.0) / 2.0


def _gather_2d(image: jax.Array, ix: jax.Array, iy: jax.Array) -> jax.Array:
    """image (C, H, W); ix/iy integer arrays (...,) → (C, ...) with zero padding."""
    h, w = image.shape[-2:]
    inb = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    ixc = jnp.clip(ix, 0, w - 1)
    iyc = jnp.clip(iy, 0, h - 1)
    vals = image[:, iyc, ixc]  # (C, ...)
    return jnp.where(inb[None], vals, 0.0)


def _bilinear_one(image: jax.Array, grid: jax.Array) -> jax.Array:
    """image (C, H, W), grid (Ho, Wo, 2) in [-1,1] (x, y) → (C, Ho, Wo)."""
    h, w = image.shape[-2:]
    x = _unnormalize(grid[..., 0], w)
    y = _unnormalize(grid[..., 1], h)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    v00 = _gather_2d(image, x0i, y0i)
    v01 = _gather_2d(image, x0i + 1, y0i)
    v10 = _gather_2d(image, x0i, y0i + 1)
    v11 = _gather_2d(image, x0i + 1, y0i + 1)

    return (
        v00 * (1 - dx) * (1 - dy)
        + v01 * dx * (1 - dy)
        + v10 * (1 - dx) * dy
        + v11 * dx * dy
    )


def _linearized_one(
    image: jax.Array, grid: jax.Array, key: jax.Array, num_aux: int = 4,
    noise_std_px: float = 1.0,
) -> jax.Array:
    """Linearized multi-sampling for one (C, H, W) image.

    Value == bilinear(grid); gradient w.r.t. grid flows through a local linear
    model fitted to `num_aux` jittered samples around each output pixel
    (reference: scripts/linearized.py:141-204 — same idea, closed-form 3×3
    normal-equation solve; exact auxiliary-noise schedule is ours).
    """
    h, w = image.shape[-2:]
    # Noise in grid units (2/size per pixel).
    scale = jnp.asarray([2.0 / w, 2.0 / h]) * noise_std_px
    noise = (
        jax.random.normal(key, (num_aux,) + grid.shape) * scale
    )  # (A, Ho, Wo, 2)
    offsets = jnp.concatenate([jnp.zeros_like(noise[:1]), noise], axis=0)  # (A+1, ...)
    grids = jax.lax.stop_gradient(grid)[None] + offsets

    samples = jax.vmap(lambda g: _bilinear_one(image, jax.lax.stop_gradient(g)))(
        grids
    )  # (A+1, C, Ho, Wo)

    # Least-squares fit: value ≈ a + J·d over the A+1 samples, d = offset (2,).
    d = offsets  # (A+1, Ho, Wo, 2)
    ones = jnp.ones_like(d[..., :1])
    x_mat = jnp.concatenate([d, ones], axis=-1)  # (A+1, Ho, Wo, 3)
    xtx = jnp.einsum("ahwi,ahwj->hwij", x_mat, x_mat)  # (Ho, Wo, 3, 3)
    xtv = jnp.einsum("ahwi,achw->hwic", x_mat, samples)  # (Ho, Wo, 3, C)
    eye = jnp.eye(3) * 1e-6
    coeff = jnp.linalg.solve(xtx + eye, xtv)  # (Ho, Wo, 3, C)
    jac = coeff[..., :2, :]  # (Ho, Wo, 2, C)

    base = samples[0]  # (C, Ho, Wo), the exact bilinear value
    delta = grid - jax.lax.stop_gradient(grid)  # zero value, carries gradient
    grad_term = jnp.einsum("hwd,hwdc->chw", delta, jax.lax.stop_gradient(jac))
    return base + grad_term


def grid_sample(
    image: jax.Array,
    grid: jax.Array,
    mode: str = "bilinear",
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """image (B, C, H, W), grid (B, Ho, Wo, 2) in [-1,1] → (B, C, Ho, Wo)."""
    if mode == "bilinear":
        return jax.vmap(_bilinear_one)(image, grid)
    if mode == "linearized":
        if key is None:
            key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, image.shape[0])
        return jax.vmap(_linearized_one)(image, grid, keys)
    raise ValueError(f"unknown sampling mode: {mode}")


def make_warp_grid(homography: jax.Array, out_shape: tuple) -> jax.Array:
    """(B, 3, 3) homography → (B, Ho, Wo, 2) sampling grid.

    The output mesh is linspace(-1, 1) inclusive over each axis, transformed by
    the homography with perspective divide
    (reference: scripts/sampling_helper.py:42-69).
    """
    ho, wo = out_shape
    ys = jnp.linspace(-1.0, 1.0, ho)
    xs = jnp.linspace(-1.0, 1.0, wo)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    pts = jnp.stack([gx.ravel(), gy.ravel(), jnp.ones(ho * wo)], axis=0)  # (3, N)
    warped = jnp.einsum("bij,jn->bin", homography, pts)
    xy = warped[:, :2] / (warped[:, 2:3] + 1e-8)
    return xy.transpose(0, 2, 1).reshape(-1, ho, wo, 2)


def warp_image(
    image: jax.Array, homography: jax.Array, out_shape: tuple,
    mode: str = "bilinear", key: Optional[jax.Array] = None,
) -> jax.Array:
    """Differentiable homography warp (B, C, H, W) → (B, C, Ho, Wo)."""
    grid = make_warp_grid(homography, out_shape)
    out = grid_sample(image, grid, mode=mode, key=key)
    # NaN scrub, as the reference does (scripts/sampling_helper.py:36-38).
    return jnp.where(jnp.isnan(out), 0.0, out)
