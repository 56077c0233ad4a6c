"""The Pallas kernel (interpret mode) matches its jnp twin in value and grad.

render_silhouette_batch_pallas routes to the jnp twin off-TPU for speed; this
test pins the kernel itself (fwd + hand-derived bwd) against the twin so TPU
behavior stays covered by CPU CI.
"""

import numpy as np
import jax
import jax.numpy as jnp

from jrr_tpu.render import silhouette as S
from jrr_tpu.render import silhouette_pallas as sp


def _packed_case(seed=3, n=60):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(4, 28, size=(n, 1, 2))
    tri = centers + rng.uniform(-2.5, 2.5, size=(n, 3, 2))
    verts = jnp.asarray(
        np.concatenate(
            [tri.reshape(-1, 2).astype(np.float32), np.ones((3 * n, 1), np.float32)], axis=1
        )
    )
    faces = jnp.asarray(np.arange(3 * n).reshape(n, 3).astype(np.int32))
    spec = S.RasterizerSpec(
        image_size=32, tile_size=8, faces_per_tile=60, sigma=5e-3,
        blur_radius=0.05, max_tiles_per_face=4,
    )
    origin, xy, sel_face, sel_valid, _ = S._bin_faces_sorted_core(verts, faces, spec)
    tri_p, valid_p, _ = sp.pack_tri(xy[sel_face], sel_valid)
    inv_sigma = (2.0 / 32) ** 2 / spec.sigma
    blur_px2 = spec.blur_radius / ((2.0 / 32) ** 2)
    return origin, tri_p, valid_p, inv_sigma, blur_px2


def test_kernel_matches_jnp_twin_fwd_and_grad():
    origin, tri, valid, inv_sigma, blur_px2 = _packed_case()

    def loss_k(t):
        return jnp.sum(
            sp.tiles_alpha_pallas(origin, t, valid, 8, inv_sigma, blur_px2, 8, True) ** 2
        )

    def loss_x(t):
        return jnp.sum(S._tiles_alpha_xla(origin, t, valid, 8, inv_sigma, blur_px2) ** 2)

    out_k = sp.tiles_alpha_pallas(origin, tri, valid, 8, inv_sigma, blur_px2, 8, True)
    out_x = S._tiles_alpha_xla(origin, tri, valid, 8, inv_sigma, blur_px2)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x), atol=1e-5)

    gk = np.asarray(jax.grad(loss_k)(tri))
    gx = np.asarray(jax.grad(loss_x)(tri))
    scale = max(np.abs(gx).max(), 1e-8)
    close = np.abs(gk - gx) <= 0.05 * scale
    assert close.mean() > 0.85, close.mean()
    np.testing.assert_allclose(gk, gx, atol=0.15 * scale)
