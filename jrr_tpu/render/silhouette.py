"""Differentiable soft-silhouette rasterizer, TPU-first.

Replaces the reference's pytorch3d `MeshRasterizer` + `SoftSilhouetteShader`
(reference: scripts/mesh_renderer.py:23-79; C++/CUDA kernels) with a
tile-binned, static-shape XLA program:

1. project vertices to screen space (render/camera.py conventions);
2. compute per-face screen bounding boxes;
3. bin: for every image tile (T×T pixels), select up to K candidate faces
   whose padded bbox intersects the tile — either the hit-matrix top_k
   formulation (`_bin_faces`) or the fast sort-based COO formulation
   (`_bin_faces_sorted_core`), both static-shape with no dynamic face lists;
4. per tile, evaluate soft coverage of its T² pixels against its K faces:
   signed squared distance to the triangle (negative inside), SoftRas/pytorch3d
   blending `p = sigmoid(−d²_ndc / σ)`;
5. alpha = 1 − Π(1 − p) — the silhouette is a *union* of face coverages, so no
   depth sort / z-buffer is needed at all (occlusion cannot change a union);
   the scan over tiles × vmap over frames keeps peak memory at one tile-batch.

With σ=1e-4 and blur_radius=0 this reproduces the reference's near-hard
silhouette (pytorch3d BlendParams σ=γ=1e-4, blur 0, 1 face/px —
scripts/mesh_renderer.py:28-38): interior pixels saturate to 1, gradients live
in a ~1px band inside each edge. A positive `blur_radius` (NDC², like
pytorch3d's) widens the band to the outside — the recommended setting when
actually optimizing through the renderer.

Differentiable w.r.t. vertices (bin assignment is a non-differentiable
selection, as in every rasterizer; coverage is computed from gathered float
coordinates). The fallback `render_silhouette_dense` evaluates all faces for
every pixel and is used as the oracle in tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from jrr_tpu import constants
from jrr_tpu.render import camera as camera_lib


class RasterizerSpec(NamedTuple):
    image_size: int = constants.CROP_RES
    sigma: float = 1e-4  # NDC^2 blend sigma (scripts/mesh_renderer.py:28)
    blur_radius: float = 0.0  # NDC^2 outside band (scripts/mesh_renderer.py:36)
    tile_size: int = 8
    faces_per_tile: int = 96
    focal_length: float = constants.FOCAL_LENGTH
    # "pallas" = fused VMEM kernel (TPU; interpret-mode elsewhere),
    # "xla" = lax.map formulation, "auto" = pallas on TPU else xla.
    backend: str = "auto"
    # Tiles per Pallas grid step; must divide B·G² and be a multiple of 8
    # (TPU sublane constraint on the origin/alpha blocks).
    pallas_chunk: int = 56
    # Sort-based binning: max tiles per axis a face's padded bbox may span
    # (cap·tile_size pixels); larger faces lose coverage beyond the cap.
    max_tiles_per_face: int = 4
    # Extra bbox padding (pixels) so candidate lists stay valid while vertices
    # drift between re-binnings (see refine/engine.py rebin amortization).
    bin_margin_px: float = 0.0
    # Fused page-gather path (silhouette_fused.py): vertex pages a tile may
    # reference, including the reserved dump slot (so P̂−1 usable).
    pages_per_tile: int = 16


def _signed_dist2_px(px: jax.Array, tri: jax.Array) -> jax.Array:
    """Signed squared distance (pixel² units) from points to triangles.

    px:  (..., P, 2) pixel centers.
    tri: (..., K, 3, 2) triangle screen vertices.
    Returns (..., P, K): negative inside the triangle, positive outside.
    """
    v0 = tri[..., 0, :]
    v1 = tri[..., 1, :]
    v2 = tri[..., 2, :]

    def edge_terms(a, b):
        # a, b: (..., K, 2); px: (..., P, 2)
        ab = b - a  # (..., K, 2)
        ap = px[..., :, None, :] - a[..., None, :, :]  # (..., P, K, 2)
        # 2D cross product (edge function).
        cross = ab[..., None, :, 0] * ap[..., 1] - ab[..., None, :, 1] * ap[..., 0]
        # Point-segment squared distance.
        len2 = jnp.sum(ab * ab, axis=-1)  # (..., K)
        t = jnp.sum(ap * ab[..., None, :, :], axis=-1) / jnp.maximum(
            len2[..., None, :], 1e-12
        )
        t = jnp.clip(t, 0.0, 1.0)
        proj = a[..., None, :, :] + t[..., None] * ab[..., None, :, :]
        d2 = jnp.sum((px[..., :, None, :] - proj) ** 2, axis=-1)
        return cross, d2

    c0, d0 = edge_terms(v0, v1)
    c1, d1 = edge_terms(v1, v2)
    c2, d2 = edge_terms(v2, v0)

    d2min = jnp.minimum(jnp.minimum(d0, d1), d2)
    inside = ((c0 >= 0) & (c1 >= 0) & (c2 >= 0)) | ((c0 <= 0) & (c1 <= 0) & (c2 <= 0))
    return jnp.where(inside, -d2min, d2min)


def _coverage(signed_d2_px: jax.Array, spec: RasterizerSpec, valid: jax.Array) -> jax.Array:
    """SoftRas/pytorch3d coverage probability per (pixel, face)."""
    # pytorch3d distances are in NDC units: the image spans 2 NDC across
    # image_size pixels.
    px_to_ndc2 = (2.0 / spec.image_size) ** 2
    d2_ndc = signed_d2_px * px_to_ndc2
    p = jax.nn.sigmoid(-d2_ndc / spec.sigma)
    # Replicate hard rasterization extent: outside pixels contribute only
    # within the blur band (blur 0 → inside only; scripts/mesh_renderer.py:36).
    in_band = d2_ndc <= spec.blur_radius
    return jnp.where(in_band & valid, p, 0.0)


def _alpha_from_coverage(p: jax.Array) -> jax.Array:
    """Union alpha over the face axis (last): 1 − Π(1 − p)."""
    return 1.0 - jnp.prod(1.0 - p, axis=-1)


def _face_screen_verts(verts_screen: jax.Array, faces: jax.Array):
    fv = verts_screen[faces]  # (F, 3, 3)
    xy = fv[..., :2]
    z = fv[..., 2]
    valid = jnp.all(z > 1e-6, axis=-1)  # cull faces behind the camera
    return xy, valid


def render_silhouette_dense(
    verts_screen: jax.Array, faces: jax.Array, spec: RasterizerSpec
) -> jax.Array:
    """Oracle path: every pixel vs every face. O(S²·F) — tests/tiny meshes only."""
    s = spec.image_size
    xy, valid = _face_screen_verts(verts_screen, faces)
    rows = jax.lax.broadcasted_iota(jnp.float32, (s, s), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (s, s), 1)
    px = jnp.stack([cols, rows], axis=-1).reshape(-1, 2)  # (S², 2) as (x, y)
    sd2 = _signed_dist2_px(px, xy)  # (S², F)
    p = _coverage(sd2, spec, valid[None, :])
    return _alpha_from_coverage(p).reshape(s, s)


def _bin_faces(verts_screen: jax.Array, faces: jax.Array, spec: RasterizerSpec):
    """Per-tile static top-K candidate face lists for one frame.

    Returns (origin (G², 2), sel_xy (G², K, 3, 2), sel_valid (G², K) bool).
    """
    s, t, k = spec.image_size, spec.tile_size, spec.faces_per_tile
    assert s % t == 0, "image_size must be divisible by tile_size"
    g = s // t
    k = min(k, faces.shape[0])

    xy, valid = _face_screen_verts(verts_screen, faces)  # (F, 3, 2), (F,)

    # Face bboxes in pixels, padded by the blur band + half-pixel.
    pad = 0.5 + spec.image_size / 2.0 * jnp.sqrt(jnp.maximum(spec.blur_radius, 0.0))
    fmin = jnp.min(xy, axis=1) - pad  # (F, 2) (x, y)
    fmax = jnp.max(xy, axis=1) + pad

    # Tile index ranges per face.
    tmin = jnp.floor(fmin / t).astype(jnp.int32)
    tmax = jnp.floor(fmax / t).astype(jnp.int32)

    # Hit mask: (G*G, F).
    tile_y = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0).reshape(-1, 1)
    tile_x = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1).reshape(-1, 1)
    hit = (
        valid[None, :]
        & (tile_x >= tmin[None, :, 0]) & (tile_x <= tmax[None, :, 0])
        & (tile_y >= tmin[None, :, 1]) & (tile_y <= tmax[None, :, 1])
    )

    # Static top-K bin per tile. Ties break to the lowest face index.
    scores = hit.astype(jnp.float32)
    _, face_idx = jax.lax.top_k(scores, k)  # (G², K)
    sel_valid = jnp.take_along_axis(hit, face_idx, axis=1)  # (G², K)
    sel_xy = xy[face_idx]  # (G², K, 3, 2)
    origin = (
        jnp.stack([tile_x[:, 0], tile_y[:, 0]], axis=-1).astype(jnp.float32) * t
    )
    return origin, sel_xy, sel_valid


def _bin_faces_sorted_core(verts_screen: jax.Array, faces: jax.Array, spec: RasterizerSpec):
    """Sort-based exact binning — the fast path for the Pallas kernel.

    The top_k formulation materializes a (G², F) hit matrix and runs top_k over
    it (~9.5 ms/frame on v5e for F=13776); here each face instead emits its
    ≤cap² (tile, face) COO pairs, one stable sort groups them by tile
    (~0.02 ms/frame), and per-tile segments are read off with two
    searchsorteds. Results are identical to `_bin_faces` whenever no face's
    padded bbox spans more than `max_tiles_per_face` tiles per axis (body
    meshes at 224²: faces are a few pixels).

    Also inverts the sort into `slot_of_pair` (F, cap²): for each face's COO
    pair, the flat (tile·K + k) slot it occupies (or the G²·K dump slot). The
    backward pass uses this to turn the gather's scatter-add transpose into
    pure gathers (see `_slot_gather`).

    Returns (origin (G², 2), xy (F, 3, 2), sel_face (G², K) int32,
    sel_valid (G², K) bool, slot_of_pair (F, cap²) int32).
    """
    s, t, k = spec.image_size, spec.tile_size, spec.faces_per_tile
    assert s % t == 0
    g = s // t
    k = min(k, faces.shape[0])
    cap = spec.max_tiles_per_face
    f = faces.shape[0]

    xy, valid = _face_screen_verts(verts_screen, faces)  # (F, 3, 2), (F,)
    pad = (
        0.5
        + spec.image_size / 2.0 * jnp.sqrt(jnp.maximum(spec.blur_radius, 0.0))
        + spec.bin_margin_px
    )
    fmin = jnp.min(xy, axis=1) - pad
    fmax = jnp.max(xy, axis=1) + pad
    tmin = jnp.floor(fmin / t).astype(jnp.int32)  # (F, 2) (x, y)
    tmax = jnp.floor(fmax / t).astype(jnp.int32)

    on_screen = valid & jnp.all(tmax >= 0, axis=1) & (tmin[:, 0] < g) & (tmin[:, 1] < g)
    tmin_c = jnp.clip(tmin, 0, g - 1)
    span = jnp.clip(tmax, 0, g - 1) - tmin_c  # (F, 2) ≥ 0 for on-screen faces

    dy = jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 0)
    dx = jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 1)
    ty = tmin_c[:, None, None, 1] + dy[None]
    tx = tmin_c[:, None, None, 0] + dx[None]
    pair_ok = (
        on_screen[:, None, None]
        & (dy[None] <= span[:, None, None, 1]) & (dx[None] <= span[:, None, None, 0])
        & (ty < g) & (tx < g)
    )
    n = f * cap * cap
    tile_id = jnp.where(pair_ok, ty * g + tx, g * g).reshape(-1)  # (N,)
    face_id = jnp.broadcast_to(
        jnp.arange(f, dtype=jnp.int32)[:, None], (f, cap * cap)
    ).reshape(-1)
    pair_id = jnp.arange(n, dtype=jnp.int32)

    keys, vals, spos = jax.lax.sort((tile_id, face_id, pair_id), num_keys=1, is_stable=True)
    tiles = jnp.arange(g * g, dtype=jnp.int32)
    start = jnp.searchsorted(keys, tiles, side="left").astype(jnp.int32)
    end = jnp.searchsorted(keys, tiles, side="right").astype(jnp.int32)
    count = end - start

    slots = start[:, None] + jnp.arange(k, dtype=jnp.int32)[None]  # (G², K)
    sel_face = vals[jnp.minimum(slots, n - 1)]
    sel_valid = jnp.arange(k)[None, :] < count[:, None]
    sel_face = jnp.where(sel_valid, sel_face, 0)

    # Invert the sort: flat output slot of each original COO pair.
    pos = jnp.arange(n, dtype=jnp.int32)
    in_grid = keys < g * g
    kk = pos - jnp.where(in_grid, start[jnp.clip(keys, 0, g * g - 1)], 0)
    slot_sorted = jnp.where(in_grid & (kk < k), keys * k + kk, g * g * k)
    slot_of_pair = (
        jnp.zeros((n,), jnp.int32).at[spos].set(slot_sorted).reshape(f, cap * cap)
    )

    tile_y = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0).reshape(-1)
    tile_x = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1).reshape(-1)
    origin = jnp.stack([tile_x, tile_y], axis=-1).astype(jnp.float32) * t
    return origin, xy, sel_face, sel_valid, slot_of_pair


def _bin_faces_sorted(verts_screen: jax.Array, faces: jax.Array, spec: RasterizerSpec):
    """Compatibility wrapper: (origin, sel_xy, sel_valid) like `_bin_faces`."""
    origin, xy, sel_face, sel_valid, _ = _bin_faces_sorted_core(
        verts_screen, faces, spec
    )
    return origin, xy[sel_face], sel_valid


@jax.custom_vjp
def _slot_gather(xy_flat: jax.Array, sel_face: jax.Array, slot_of_pair: jax.Array):
    """xy_flat (F, 6) → (G², K, 6) by sel_face, with a scatter-free backward.

    The plain gather's VJP is a (G²·K)-row scatter-add — the dominant cost of
    the rasterizer backward (~5 ms/frame of 7 on v5e). Here the transpose is
    expressed through the precomputed slot table: each face SUMS the cotangent
    rows of its own ≤cap² slots — gathers only.
    """
    return xy_flat[sel_face]


def _slot_gather_fwd(xy_flat, sel_face, slot_of_pair):
    return xy_flat[sel_face], (sel_face.shape, slot_of_pair)


def _slot_gather_bwd(res, g):
    import numpy as _np

    sel_shape, slot_of_pair = res
    g_flat = g.reshape(-1, g.shape[-1])
    g_pad = jnp.concatenate([g_flat, jnp.zeros((1, g.shape[-1]), g.dtype)], axis=0)
    idx = jnp.minimum(slot_of_pair, g_pad.shape[0] - 1)
    d_pairs = g_pad[idx.reshape(-1)]  # (F·cap², 6)
    dxy = d_pairs.reshape(slot_of_pair.shape[0], -1, g.shape[-1]).sum(axis=1)
    f0 = jax.dtypes.float0
    return (
        dxy,
        _np.zeros(sel_shape, dtype=f0),
        _np.zeros(slot_of_pair.shape, dtype=f0),
    )


_slot_gather.defvjp(_slot_gather_fwd, _slot_gather_bwd)


def _tiles_alpha_xla(origin, tri, valid, tile, inv_sigma, blur_px2):
    """jnp twin of the Pallas tile kernel (same packed layout and math).

    Used on non-TPU backends — interpret-mode Pallas inside refinement scans
    is orders of magnitude slower on CPU. Gradients come from plain autodiff.
    origin (N, 2), tri (N, 6, K), valid (N, 1, K) → (N, T²).
    """
    t2 = tile * tile
    idx = jnp.arange(t2)
    px_x = origin[:, 0:1, None] + (idx % tile)[None, :, None]  # (N, T², 1)
    px_y = origin[:, 1:2, None] + (idx // tile)[None, :, None]
    ax, ay, bx, by, cx, cy = (tri[:, i, None, :] for i in range(6))  # (N, 1, K)

    def edge(a_x, a_y, b_x, b_y):
        ex = b_x - a_x
        ey = b_y - a_y
        qx = px_x - a_x
        qy = px_y - a_y
        cross = ex * qy - ey * qx
        len2 = jnp.maximum(ex * ex + ey * ey, 1e-12)
        t = jnp.clip((qx * ex + qy * ey) / len2, 0.0, 1.0)
        rx = qx - t * ex
        ry = qy - t * ey
        return cross, rx * rx + ry * ry

    c0, d0 = edge(ax, ay, bx, by)
    c1, d1 = edge(bx, by, cx, cy)
    c2, d2 = edge(cx, cy, ax, ay)
    dmin = jnp.minimum(jnp.minimum(d0, d1), d2)
    inside = ((c0 >= 0) & (c1 >= 0) & (c2 >= 0)) | ((c0 <= 0) & (c1 <= 0) & (c2 <= 0))
    sd2 = jnp.where(inside, -dmin, dmin)
    p = jax.nn.sigmoid(-sd2 * inv_sigma)
    p = jnp.where((sd2 <= blur_px2) & (valid[:, 0:1, :] > 0), p, 0.0)
    from jrr_tpu.render import silhouette_pallas as sp

    # Same exp(Σlog) lane product as the kernels so kernel-vs-twin
    # forwards stay bit-exact.
    return 1.0 - sp._lane_prod(jnp.maximum(1.0 - p, 1e-30))


def render_silhouette(
    verts_screen: jax.Array, faces: jax.Array, spec: RasterizerSpec
) -> jax.Array:
    """Tile-binned rasterization of one frame (XLA tile loop).
    verts_screen: (V, 3) (x, y, z_view)."""
    s, t = spec.image_size, spec.tile_size
    g = s // t
    origin, sel_xy, sel_valid = _bin_faces(verts_screen, faces, spec)

    # Pixel centers per tile: (T², 2) offsets.
    off_r = jax.lax.broadcasted_iota(jnp.float32, (t, t), 0)
    off_c = jax.lax.broadcasted_iota(jnp.float32, (t, t), 1)
    tile_offsets = jnp.stack([off_c, off_r], axis=-1).reshape(-1, 2)  # (x, y)

    # Rematerialized in the backward pass: the (T², K) distance/coverage
    # intermediates are recomputed rather than stored, keeping the VJP memory
    # footprint at the (G², T²) alpha image instead of O(G²·T²·K) residuals
    # (without this, a 100-step refinement scan at 224² OOMs a 16G chip).
    @jax.checkpoint
    def tile_alpha(args):
        orig, tri, tri_valid = args  # (2,), (K, 3, 2), (K,)
        px = orig[None, :] + tile_offsets  # (T², 2)
        sd2 = _signed_dist2_px(px, tri)  # (T², K)
        p = _coverage(sd2, spec, tri_valid[None, :])
        return _alpha_from_coverage(p)  # (T²,)

    # Sequential over tiles (keeps peak memory to one tile); batch-parallelism
    # comes from vmapping this whole function over frames.
    alphas = jax.lax.map(
        tile_alpha, (origin, sel_xy, sel_valid), batch_size=max(1, g)
    )  # (G², T²)

    img = alphas.reshape(g, g, t, t).transpose(0, 2, 1, 3).reshape(s, s)
    return img


def _tiles_to_image(alphas: jax.Array, g: int, t: int) -> jax.Array:
    """(..., G², T²) → (..., S, S)."""
    lead = alphas.shape[:-2]
    return (
        alphas.reshape(lead + (g, g, t, t))
        .swapaxes(-3, -2)
        .reshape(lead + (g * t, g * t))
    )


class BinState(NamedTuple):
    """Reusable per-batch candidate lists (all non-differentiable)."""

    origin: jax.Array  # (B, G², 2)
    sel_face: jax.Array  # (B, G², K) int32
    sel_valid: jax.Array  # (B, G², K) bool
    slot_of_pair: jax.Array  # (B, F, cap²) int32


def compute_bins(
    vertices_smpl: jax.Array, faces: jax.Array, cam_t: jax.Array, spec: RasterizerSpec
) -> BinState:
    """Bin once for reuse across refinement steps (set `bin_margin_px` to the
    expected vertex drift so slightly-stale bins remain covering)."""
    verts_screen = camera_lib.project_points_screen(
        vertices_smpl, cam_t, spec.image_size, spec.focal_length
    )
    origin, _, sel_face, sel_valid, slot_of_pair = jax.vmap(
        functools.partial(_bin_faces_sorted_core, faces=faces, spec=spec)
    )(jax.lax.stop_gradient(verts_screen))
    return BinState(origin, sel_face, sel_valid, slot_of_pair)


def render_silhouette_batch_pallas(
    verts_screen: jax.Array, faces: jax.Array, spec: RasterizerSpec,
    bins: Optional[BinState] = None,
) -> jax.Array:
    """Batched rasterization through the fused Pallas tile kernel.

    Binning stays in XLA (sort + gathers); all (B, G²) tiles flatten into one
    kernel launch — tiles are fully independent, so the batch axis just
    extends the grid. Pass `bins` to reuse candidate lists across steps.
    """
    from jrr_tpu.render import silhouette_pallas as sp

    b = verts_screen.shape[0]
    s, t = spec.image_size, spec.tile_size
    g = s // t

    if bins is None:
        origin, xy, sel_face, sel_valid, slot_of_pair = jax.vmap(
            functools.partial(_bin_faces_sorted_core, faces=faces, spec=spec)
        )(verts_screen)
    else:
        origin, sel_face, sel_valid, slot_of_pair = bins
        xy, _ = jax.vmap(functools.partial(_face_screen_verts, faces=faces))(verts_screen)
    sel_xy = jax.vmap(_slot_gather)(
        xy.reshape(b, -1, 6), sel_face, slot_of_pair
    ).reshape(sel_face.shape + (3, 2))

    tri, valid, _ = jax.vmap(sp.pack_tri)(sel_xy, sel_valid)
    flat = lambda x: x.reshape((b * g * g,) + x.shape[2:])

    px_to_ndc2 = (2.0 / s) ** 2
    inv_sigma = px_to_ndc2 / spec.sigma
    blur_px2 = spec.blur_radius / px_to_ndc2 if spec.blur_radius > 0 else 0.0

    if jax.default_backend() == "tpu":
        from jrr_tpu.render.silhouette_fused import _pick_chunk

        # Shared picker: PREFERS an 8-divisible divisor of the tile count
        # (TPU sublane constraint on the origin/alpha blocks). Grids whose
        # tile count has no 8-divisible divisor (e.g. 49) still fall back to
        # any divisor and remain unsupported on the TPU kernel path — use
        # tile/image sizes whose G² is a multiple of 8.
        chunk = _pick_chunk(b * g * g, spec.pallas_chunk)
        alphas = sp.tiles_alpha_pallas(
            flat(origin), flat(tri), flat(valid),
            t, inv_sigma, blur_px2, chunk, False,
        )  # (B·G², T²)
    else:
        alphas = _tiles_alpha_xla(
            flat(origin), flat(tri), flat(valid), t, inv_sigma, blur_px2
        )
    return _tiles_to_image(alphas.reshape(b, g * g, t * t), g, t)


def render_mesh_silhouette(
    vertices_smpl: jax.Array,
    faces: jax.Array,
    cam_t: jax.Array,
    spec: RasterizerSpec = RasterizerSpec(),
    dense: bool = False,
    bins: Optional[BinState] = None,
) -> jax.Array:
    """Batched end-to-end: SMPL-frame vertices (B, V, 3) + cam (B, 3) → (B, S, S).

    Matches the reference `render_mesh` chain (reference: scripts/optimize.py:77-85):
    flip/scale vertices, perspective camera at T, soft-silhouette alpha.
    `bins` (from `compute_bins`) reuses candidate face lists across steps.
    """
    verts_screen = camera_lib.project_points_screen(
        vertices_smpl, cam_t, spec.image_size, spec.focal_length
    )
    if dense:
        return jax.vmap(
            functools.partial(render_silhouette_dense, faces=faces, spec=spec)
        )(verts_screen)
    backend = spec.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas" or bins is not None:
        return render_silhouette_batch_pallas(verts_screen, faces, spec, bins=bins)
    return jax.vmap(
        functools.partial(render_silhouette, faces=faces, spec=spec)
    )(verts_screen)
