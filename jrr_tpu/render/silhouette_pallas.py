"""Pallas TPU kernel for the per-tile soft-coverage computation.

The XLA formulation of the tile×face coverage (render/silhouette.py) is
HBM-bound: the (tiles, pixels, faces) elementwise chain materializes ~20
intermediate tensors per frame. This kernel fuses the entire chain —
edge functions, point-segment distances, signed union blending — in VMEM,
with a hand-derived backward kernel (custom VJP) that recomputes the forward
quantities instead of storing them.

Math notes for the backward (per edge (a, b), pixel p):
    e = b − a, q = p − a, t = clamp(q·e/‖e‖², 0, 1), r = q − t·e, d² = ‖r‖²
    ∂d²/∂a = −2(1−t)·r, ∂d²/∂b = −2t·r
(valid for the clamped cases too: t=0 ⇒ ∂a = −2r, ∂b = 0; t=1 symmetric; in
the interior r ⊥ e makes the ∂t terms vanish). The min over edges routes the
gradient to the arg-min edge; the inside/outside sign flips it; the union
α = 1 − Π(1−p_k) contributes Π_{j≠k}(1−p_j) per face, computed as total/(1−p_k)
— safe because wherever (1−p_k) → 0 the sigmoid factor p(1−p) → 0 first.

Faces axis is padded to the 128-lane boundary; `chunk` tiles are processed per
grid step to amortize dispatch. Used through `render/silhouette.py` when
running on TPU; interpret mode keeps CPU tests hermetic.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _edge_terms(px_x, px_y, ax, ay, bx, by):
    """Returns (cross, t, rx, ry, d2) for one edge, shapes (T², K).

    len2 depends only on the corner rows (1, K), so its reciprocal is
    computed once per row and broadcast — a (T², K) divide (multi-pass on
    the VPU) becomes a (1, K) reciprocal + (T², K) multiply."""
    ex = bx - ax
    ey = by - ay
    qx = px_x - ax
    qy = px_y - ay
    cross = ex * qy - ey * qx
    inv_len2 = 1.0 / jnp.maximum(ex * ex + ey * ey, 1e-12)  # (1, K)
    t = (qx * ex + qy * ey) * inv_len2
    t = jnp.clip(t, 0.0, 1.0)
    rx = qx - t * ex
    ry = qy - t * ey
    d2 = rx * rx + ry * ry
    return cross, t, rx, ry, d2


def _lane_prod(x, *, keepdims=False):
    """Π over the lane (last) axis as exp(Σ log x); x must be > 0 (callers
    clamp 1−p to ≥1e-30). Shared by the Mosaic kernels AND the XLA twins so
    kernel-vs-twin forwards stay bit-exact (KERNELPAR fwd_max_abs = 0.0).

    Measured negative result (keep log/exp): a transcendental-free
    `pltpu.roll` rotate-multiply doubling tree (7 full-vreg roll+mul steps
    for 128 lanes, bit-identical across Mosaic/interpret/XLA) was 3× SLOWER
    in the one-pass loss+grad kernel — 1.22 vs 0.39 ms/frame at full size
    (tools/fused_probe.py), 41.5 → 25.1 frames/s/chip end-to-end. Cross-lane
    rolls cost far more per op than pipelined transcendentals on the VPU;
    narrowing halving-slice trees were ~2× slower again (sub-128-lane
    relayouts per step)."""
    return jnp.exp(jnp.sum(jnp.log(x), axis=-1, keepdims=keepdims))


def _pixel_coords(origin_ref, c, t2, tile, k_pad):
    ox = origin_ref[c, 0]  # scalars from SMEM — broadcast against vectors
    oy = origin_ref[c, 1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (t2, k_pad), 0)
    row = idx // tile
    px_x = ox + (idx - row * tile).astype(jnp.float32)  # idx % tile
    px_y = oy + row.astype(jnp.float32)
    return px_x, px_y


def _coverage_rows(px_x, px_y, rows, *, inv_sigma, blur_px2, valid_row=None):
    """Coverage from corner-coordinate rows (shared by both kernel families).

    rows = (ax, ay, bx, by, cx, cy), each (1, K); px_* (T², K).
    Returns (p, sd2, dmin, inside, edges).
    """
    ax, ay, bx, by, cx, cy = rows
    c0, t0, rx0, ry0, d0 = _edge_terms(px_x, px_y, ax, ay, bx, by)
    c1, t1, rx1, ry1, d1 = _edge_terms(px_x, px_y, bx, by, cx, cy)
    c2, t2_, rx2, ry2, d2 = _edge_terms(px_x, px_y, cx, cy, ax, ay)

    dmin = jnp.minimum(jnp.minimum(d0, d1), d2)
    inside = ((c0 >= 0) & (c1 >= 0) & (c2 >= 0)) | ((c0 <= 0) & (c1 <= 0) & (c2 <= 0))
    sd2 = jnp.where(inside, -dmin, dmin)

    p = jax.nn.sigmoid(-sd2 * inv_sigma)
    in_band = sd2 <= blur_px2
    if valid_row is not None:
        in_band = in_band & (valid_row > 0)
    p = jnp.where(in_band, p, 0.0)
    edges = (
        (c0, t0, rx0, ry0, d0),
        (c1, t1, rx1, ry1, d1),
        (c2, t2_, rx2, ry2, d2),
    )
    return p, sd2, dmin, inside, edges


def _corner_row_grads(g, p, dmin, inside, edges, *, inv_sigma, k_pad, total=None):
    """dL/d(ax, ay, bx, by, cx, cy) rows (1, K) given dL/dα per pixel.

    g: (T², 1). Routes the min-distance subgradient with the tolerance-band
    symmetric split (see `_bwd_kernel` docstring for why exact argmin is
    fp-fragile here). Pass `total` = Π(1−p) (T², 1) when the caller already
    computed the union product (the one-pass loss+grad kernel) to skip the
    log-sum recomputation.
    """
    one_minus = jnp.maximum(1.0 - p, 1e-30)
    if total is None:
        total = _lane_prod(one_minus, keepdims=True)  # (T², 1) = Π(1−p)

    dl_dp = g * total / one_minus
    dl_dsd2 = dl_dp * (-inv_sigma) * p * (1.0 - p)
    dl_ddmin = jnp.where(inside, -dl_dsd2, dl_dsd2)

    d0, d1, d2 = edges[0][4], edges[1][4], edges[2][4]
    tol = 1e-4 * (1.0 + dmin)
    sel = tuple((d_e <= dmin + tol).astype(jnp.float32) for d_e in (d0, d1, d2))
    # nsel ∈ {1, 2, 3}: replace the (T², K) divide with two selects.
    nsel = sel[0] + sel[1] + sel[2]
    inv_nsel = jnp.where(
        nsel <= 1.0, 1.0, jnp.where(nsel <= 2.0, 0.5, 1.0 / 3.0)
    )
    route = dl_ddmin * inv_nsel
    acc = [jnp.zeros((1, k_pad), jnp.float32) for _ in range(6)]  # ax ay bx by cx cy
    ends = ((0, 2), (2, 4), (4, 0))  # corner slots per edge: (A,B), (B,C), (C,A)
    for e in range(3):
        _, te, rxe, rye, _ = edges[e]
        w = sel[e] * route
        ga_x = jnp.sum(w * (-2.0) * (1.0 - te) * rxe, axis=0, keepdims=True)
        ga_y = jnp.sum(w * (-2.0) * (1.0 - te) * rye, axis=0, keepdims=True)
        gb_x = jnp.sum(w * (-2.0) * te * rxe, axis=0, keepdims=True)
        gb_y = jnp.sum(w * (-2.0) * te * rye, axis=0, keepdims=True)
        a_slot, b_slot = ends[e]
        acc[a_slot] = acc[a_slot] + ga_x
        acc[a_slot + 1] = acc[a_slot + 1] + ga_y
        acc[b_slot] = acc[b_slot] + gb_x
        acc[b_slot + 1] = acc[b_slot + 1] + gb_y
    return acc


def _coverage_terms(tri_ref, valid_ref, origin_ref, c, *, tile, k_pad, inv_sigma, blur_px2):
    """Shared forward computation for one tile c of the chunk."""
    t2 = tile * tile
    px_x, px_y = _pixel_coords(origin_ref, c, t2, tile, k_pad)
    rows = tuple(tri_ref[c, i : i + 1, :] for i in range(6))
    return _coverage_rows(
        px_x, px_y, rows, inv_sigma=inv_sigma, blur_px2=blur_px2,
        valid_row=valid_ref[c, 0:1, :],
    )


def _fwd_kernel(origin_ref, tri_ref, valid_ref, out_ref, *, tile, k_pad, inv_sigma, blur_px2, chunk):
    for c in range(chunk):
        p, *_ = _coverage_terms(
            tri_ref, valid_ref, origin_ref, c,
            tile=tile, k_pad=k_pad, inv_sigma=inv_sigma, blur_px2=blur_px2,
        )
        # α = 1 − Π(1−p) (log-arg clamped; saturated faces drive the product
        # to 0 exactly as prod would).
        one_minus = jnp.maximum(1.0 - p, 1e-30)
        alpha = 1.0 - _lane_prod(one_minus)
        out_ref[c, :] = alpha


def _bwd_kernel(
    origin_ref, tri_ref, valid_ref, g_ref, dtri_ref,
    *, tile, k_pad, inv_sigma, blur_px2, chunk,
):
    t2 = tile * tile
    for c in range(chunk):
        # Gradient routing notes: the min-distance subgradient uses a relative
        # tolerance band, NOT an exact argmin — exact float comparisons on
        # d_e == dmin are fp-fragile (the compiler may re-fuse the d
        # computations with different FMA contraction per use, so a near-tie
        # pixel — degenerate "needle" faces tie along their whole length —
        # can drop out of, or double into, the masks). Tied edges SPLIT the
        # gradient evenly — the symmetric subgradient. See _corner_row_grads.
        p, sd2, dmin, inside, edges = _coverage_terms(
            tri_ref, valid_ref, origin_ref, c,
            tile=tile, k_pad=k_pad, inv_sigma=inv_sigma, blur_px2=blur_px2,
        )
        g = g_ref[c, :].reshape(t2, 1)  # dL/dα per pixel
        acc = _corner_row_grads(
            g, p, dmin, inside, edges, inv_sigma=inv_sigma, k_pad=k_pad
        )
        for s in range(6):
            dtri_ref[c, s, :] = acc[s][0, :]


def _pallas_args(num_tiles: int, chunk: int):
    assert num_tiles % chunk == 0
    return num_tiles // chunk


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7)
)
def tiles_alpha_pallas(
    origin: jax.Array,  # (G², 2) f32 tile origins in pixels
    tri: jax.Array,  # (G², 6, K_pad) f32 [ax ay bx by cx cy]
    valid: jax.Array,  # (G², 1, K_pad) f32 1/0
    tile: int,
    inv_sigma: float,
    blur_px2: float,
    chunk: int = 4,
    interpret: bool = False,
):
    return _tiles_alpha_fwd_impl(origin, tri, valid, tile, inv_sigma, blur_px2, chunk, interpret)


def _tiles_alpha_fwd_impl(origin, tri, valid, tile, inv_sigma, blur_px2, chunk, interpret):
    g2, _, k_pad = tri.shape
    t2 = tile * tile
    grid = (_pallas_args(g2, chunk),)
    kernel = functools.partial(
        _fwd_kernel, tile=tile, k_pad=k_pad, inv_sigma=inv_sigma,
        blur_px2=blur_px2, chunk=chunk,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, 6, k_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1, k_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, t2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g2, t2), jnp.float32),
        interpret=interpret,
    )(origin, tri, valid)


def _tiles_alpha_fwd(origin, tri, valid, tile, inv_sigma, blur_px2, chunk, interpret):
    out = _tiles_alpha_fwd_impl(origin, tri, valid, tile, inv_sigma, blur_px2, chunk, interpret)
    return out, (origin, tri, valid)


def _tiles_alpha_bwd(tile, inv_sigma, blur_px2, chunk, interpret, res, g):
    origin, tri, valid = res
    g2, _, k_pad = tri.shape
    t2 = tile * tile
    grid = (_pallas_args(g2, chunk),)
    kernel = functools.partial(
        _bwd_kernel, tile=tile, k_pad=k_pad, inv_sigma=inv_sigma,
        blur_px2=blur_px2, chunk=chunk,
    )
    dtri = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((chunk, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, 6, k_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1, k_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, t2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, 6, k_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g2, 6, k_pad), jnp.float32),
        interpret=interpret,
    )(origin, tri, valid, g)
    return jnp.zeros_like(origin), dtri, jnp.zeros_like(valid)


tiles_alpha_pallas.defvjp(_tiles_alpha_fwd, _tiles_alpha_bwd)


def pack_tri(sel_xy: jax.Array, sel_valid: jax.Array) -> Tuple[jax.Array, jax.Array, int]:
    """(G², K, 3, 2) + (G², K) bool → ((G², 6, K_pad), (G², 1, K_pad), K_pad)."""
    g2, k = sel_valid.shape
    k_pad = _round_up(k, _LANES)
    tri = sel_xy.reshape(g2, k, 6).transpose(0, 2, 1)  # (G², 6, K) [ax ay bx by cx cy]
    tri = jnp.pad(tri, ((0, 0), (0, 0), (0, k_pad - k)))
    valid = jnp.pad(sel_valid.astype(jnp.float32)[:, None, :], ((0, 0), (0, 0), (0, k_pad - k)))
    return tri, valid, k_pad
