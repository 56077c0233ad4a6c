"""Pallas rasterizer path (interpret mode on CPU): parity with the dense
oracle and hand-derived backward vs autodiff of the XLA formulation."""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from jrr_tpu.render import silhouette as S


def _small_scene(seed=3, n=60):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(4, 28, size=(n, 1, 2))
    tri = centers + rng.uniform(-2.5, 2.5, size=(n, 3, 2))
    verts = jnp.asarray(
        np.concatenate(
            [tri.reshape(-1, 2).astype(np.float32), np.ones((3 * n, 1), np.float32)],
            axis=1,
        )
    )
    faces = jnp.asarray(np.arange(3 * n).reshape(n, 3).astype(np.int32))
    return verts, faces


def test_pallas_matches_dense():
    verts, faces = _small_scene()
    spec = S.RasterizerSpec(
        image_size=32, tile_size=8, faces_per_tile=60, sigma=1e-3,
        blur_radius=0.005, max_tiles_per_face=4,
    )
    dense = S.render_silhouette_dense(verts, faces, spec)
    pal = S.render_silhouette_batch_pallas(verts[None], faces, spec)[0]
    np.testing.assert_allclose(np.asarray(pal), np.asarray(dense), atol=1e-5)


def test_sorted_binning_matches_topk_binning():
    verts, faces = _small_scene(seed=7)
    spec = S.RasterizerSpec(
        image_size=32, tile_size=8, faces_per_tile=60, sigma=1e-3,
        blur_radius=0.005, max_tiles_per_face=4,
    )
    o1, x1, v1 = S._bin_faces(verts, faces, spec)
    o2, x2, v2 = S._bin_faces_sorted(verts, faces, spec)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    # Same face sets per tile (both orderings are by ascending face index).
    np.testing.assert_allclose(
        np.where(np.asarray(v1)[..., None, None], np.asarray(x1), 0),
        np.where(np.asarray(v2)[..., None, None], np.asarray(x2), 0),
        atol=0,
    )


def test_pallas_gradient_close_to_xla():
    verts, faces = _small_scene(seed=5, n=20)
    spec = S.RasterizerSpec(
        image_size=32, tile_size=8, faces_per_tile=60, sigma=5e-3,
        blur_radius=0.05, max_tiles_per_face=4,
    )

    def loss_pal(v):
        return jnp.mean(S.render_silhouette_batch_pallas(v, faces, spec) ** 2)

    def loss_xla(v):
        return jnp.mean(
            jax.vmap(functools.partial(S.render_silhouette, faces=faces, spec=spec))(v) ** 2
        )

    gp = np.asarray(jax.grad(loss_pal)(verts[None]))
    gx = np.asarray(jax.grad(loss_xla)(verts[None]))
    scale = np.abs(gx).max()
    # Both are valid subgradients; they may differ where the arg-min edge ties
    # or at the blur-band boundary (measure-zero sets). Require agreement in
    # bulk: ≥85% of components within 5% of the gradient scale, all within 15%.
    close = np.abs(gp - gx) <= 0.05 * scale
    assert close.mean() > 0.85, close.mean()
    np.testing.assert_allclose(gp, gx, atol=0.15 * scale)


def test_pallas_behind_camera_and_offscreen():
    verts, faces = _small_scene(seed=9, n=10)
    spec = S.RasterizerSpec(image_size=32, tile_size=8, faces_per_tile=30)
    v_behind = verts.at[:, 2].set(-1.0)
    img = S.render_silhouette_batch_pallas(v_behind[None], faces, spec)[0]
    assert float(jnp.max(img)) == 0.0
    v_off = verts.at[:, 0].add(10_000.0)
    img2 = S.render_silhouette_batch_pallas(v_off[None], faces, spec)[0]
    assert float(jnp.max(img2)) == 0.0
