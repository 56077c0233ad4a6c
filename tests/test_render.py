"""Camera projection and soft-silhouette rasterizer tests."""

import numpy as np
import jax
import jax.numpy as jnp

from jrr_tpu.render import camera, silhouette


class TestCamera:
    def test_optical_axis_hits_image_center(self):
        # A point on the camera axis lands at (S-1)/2 in both coords
        # (pytorch3d 0.3.0 screen convention).
        pts = jnp.zeros((1, 1, 3))
        cam_t = jnp.asarray([[0.0, 0.0, 5.0]])
        out = camera.project_points_screen(pts, cam_t, image_size=224)
        np.testing.assert_allclose(out[0, 0, :2], [111.5, 111.5], atol=1e-4)

    def test_flip_convention(self):
        # +x in SMPL frame (subject's left) → negated camera x → negative ndc_x
        # → larger screen column (appears on image right), matching the
        # reference chain (scripts/renderer.py:35-37 + pytorch3d 0.3.0 screen).
        pts = jnp.asarray([[[0.1, 0.0, 0.0]]])
        cam_t = jnp.asarray([[0.0, 0.0, 5.0]])
        out = camera.project_points_screen(pts, cam_t, image_size=224)
        assert float(out[0, 0, 0]) > 111.5
        # +y in SMPL frame (up) → negated camera y → larger screen row (down
        # in pytorch3d's row order... row = (S-1)/2(1-y_ndc), y_ndc<0 → bigger).
        pts_y = jnp.asarray([[[0.0, 0.1, 0.0]]])
        out_y = camera.project_points_screen(pts_y, cam_t, image_size=224)
        assert float(out_y[0, 0, 1]) > 111.5

    def test_projection_formula(self):
        # Manual chain for an arbitrary point.
        p = np.array([0.05, -0.08, 0.1], np.float32)
        t = np.array([0.2, -0.1, 4.0], np.float32)
        s = 224
        cam_pt = np.array([-2 * p[0], -2 * p[1], 2 * p[2]]) + t
        ndc = 5000.0 / s * cam_pt[:2] / cam_pt[2]
        expect = (s - 1) / 2 * (1 - ndc)
        out = camera.project_points_screen(jnp.asarray(p)[None, None], jnp.asarray(t)[None])
        np.testing.assert_allclose(out[0, 0, :2], expect, rtol=1e-5)

    def test_weak_perspective_translation(self):
        cam = jnp.asarray([[0.9, 0.1, -0.2]])
        t = camera.weak_perspective_to_translation(cam, image_size=224)
        np.testing.assert_allclose(
            t[0], [-0.2, 0.4, 2 * 5000 / (224 * 0.9 + 1e-9)], rtol=1e-5
        )


def _triangle_verts_screen():
    # One triangle in screen space at depth 1.
    return jnp.asarray(
        [[5.0, 5.0, 1.0], [25.0, 5.0, 1.0], [5.0, 25.0, 1.0]], dtype=jnp.float32
    )


class TestSilhouetteDense:
    def test_triangle_coverage(self):
        spec = silhouette.RasterizerSpec(image_size=32, tile_size=8, faces_per_tile=4)
        img = silhouette.render_silhouette_dense(
            _triangle_verts_screen(), jnp.asarray([[0, 1, 2]]), spec
        )
        img = np.asarray(img)
        assert img.shape == (32, 32)
        # interior (row=y, col=x)
        assert img[8, 8] > 0.99
        # far outside
        assert img[30, 30] < 1e-3
        # behind-hypotenuse outside point
        assert img[24, 24] < 1e-3

    def test_behind_camera_culled(self):
        spec = silhouette.RasterizerSpec(image_size=32)
        verts = _triangle_verts_screen().at[:, 2].set(-1.0)
        img = silhouette.render_silhouette_dense(verts, jnp.asarray([[0, 1, 2]]), spec)
        assert float(jnp.max(img)) == 0.0

    def test_blur_band_softens_outside(self):
        spec_hard = silhouette.RasterizerSpec(image_size=32, blur_radius=0.0)
        spec_soft = silhouette.RasterizerSpec(image_size=32, blur_radius=0.01, sigma=1e-3)
        faces = jnp.asarray([[0, 1, 2]])
        hard = np.asarray(
            silhouette.render_silhouette_dense(_triangle_verts_screen(), faces, spec_hard)
        )
        soft = np.asarray(
            silhouette.render_silhouette_dense(_triangle_verts_screen(), faces, spec_soft)
        )
        # One pixel just outside the left edge: hard → 0, soft → in (0, 1).
        assert hard[10, 4] == 0.0
        assert 0.0 < soft[10, 4] < 1.0


class TestBinnedVsDense:
    def _mesh(self, n_faces=48, seed=0):
        rng = np.random.default_rng(seed)
        v = rng.uniform(2, 30, size=(30, 2)).astype(np.float32)
        z = np.ones((30, 1), np.float32)
        verts = jnp.asarray(np.concatenate([v, z], axis=1))
        faces = jnp.asarray(rng.integers(0, 30, size=(n_faces, 3)).astype(np.int32))
        return verts, faces

    def test_binned_matches_dense_when_k_covers_all(self):
        verts, faces = self._mesh()
        spec = silhouette.RasterizerSpec(
            image_size=32, tile_size=8, faces_per_tile=48, sigma=1e-3, blur_radius=0.005
        )
        dense = silhouette.render_silhouette_dense(verts, faces, spec)
        binned = silhouette.render_silhouette(verts, faces, spec)
        np.testing.assert_allclose(np.asarray(binned), np.asarray(dense), atol=1e-5)

    def test_binned_close_with_small_k(self):
        # Small faces (like a real body mesh at 224²) — K below the total face
        # count but above the local per-tile density is lossless in practice.
        rng = np.random.default_rng(3)
        centers = rng.uniform(4, 28, size=(60, 1, 2))
        tri = centers + rng.uniform(-2.5, 2.5, size=(60, 3, 2))
        verts_np = tri.reshape(-1, 2).astype(np.float32)
        verts = jnp.asarray(
            np.concatenate([verts_np, np.ones((180, 1), np.float32)], axis=1)
        )
        faces = jnp.asarray(np.arange(180).reshape(60, 3).astype(np.int32))
        spec = silhouette.RasterizerSpec(
            image_size=32, tile_size=8, faces_per_tile=24, sigma=1e-3, blur_radius=0.005
        )
        dense = silhouette.render_silhouette_dense(verts, faces, spec)
        binned = silhouette.render_silhouette(verts, faces, spec)
        assert float(jnp.mean(jnp.abs(binned - dense))) < 0.02


class TestGradients:
    def test_finite_diff_gradient(self):
        # d(coverage)/d(vertex) matches finite differences in soft mode.
        spec = silhouette.RasterizerSpec(image_size=32, sigma=5e-3, blur_radius=0.05)
        faces = jnp.asarray([[0, 1, 2]])
        verts0 = _triangle_verts_screen()

        def mean_alpha(verts):
            return jnp.mean(silhouette.render_silhouette_dense(verts, faces, spec))

        g = jax.grad(mean_alpha)(verts0)
        eps = 1e-2
        for (i, j) in [(0, 0), (1, 1), (2, 0)]:
            vp = verts0.at[i, j].add(eps)
            vm = verts0.at[i, j].add(-eps)
            fd = (mean_alpha(vp) - mean_alpha(vm)) / (2 * eps)
            np.testing.assert_allclose(float(g[i, j]), float(fd), rtol=0.05, atol=1e-5)

    def test_grad_through_binned_and_camera(self):
        from jrr_tpu.models import smpl as smpl_mod

        model = smpl_mod.synthetic_smpl_model(seed=1, num_verts=96, num_faces=64)
        spec = silhouette.RasterizerSpec(
            image_size=32, tile_size=8, faces_per_tile=64, sigma=5e-3, blur_radius=0.05
        )
        cam_t = jnp.asarray([[0.0, 0.2, 30.0]])
        verts = model.v_template[None]

        def loss(v):
            img = silhouette.render_mesh_silhouette(v, model.faces, cam_t, spec)
            return jnp.mean((img - 0.5) ** 2)

        g = jax.jit(jax.grad(loss))(verts)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.sum(jnp.abs(g))) > 0
