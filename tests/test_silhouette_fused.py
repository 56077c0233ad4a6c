"""Fused page-gather rasterizer: parity with the dense oracle, kernel vs XLA
twin (interpret mode), gradients, and the capacity counters (never-silent
caps — VERDICT r1 item 6)."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jrr_tpu.models import smpl as smpl_mod
from jrr_tpu.render import camera as camera_lib
from jrr_tpu.render import silhouette as sil
from jrr_tpu.render import silhouette_fused as sf


def _problem(batch=2, num_verts=96, image=32, seed=0, **spec_kw):
    model = smpl_mod.synthetic_smpl_model(seed=seed, num_verts=num_verts, num_faces=160)
    rng = np.random.default_rng(seed)
    verts = model.v_template[None] + jnp.asarray(
        rng.normal(scale=0.01, size=(batch, num_verts, 3)).astype(np.float32)
    )
    cam_t = jnp.asarray(
        np.stack(
            [rng.uniform(-0.05, 0.05, batch), rng.uniform(-0.05, 0.05, batch),
             rng.uniform(18, 25, batch)], axis=-1,
        ).astype(np.float32)
    )
    spec = sil.RasterizerSpec(
        image_size=image, tile_size=8, faces_per_tile=64,
        sigma=1e-4, blur_radius=2e-4, **spec_kw,
    )
    return model, verts, cam_t, spec


class TestFusedForward:
    def test_matches_dense_oracle(self):
        model, verts, cam_t, spec = _problem()
        tiles = sf.silhouette_tiles_fused(verts, model, cam_t, spec)
        img = sf.tiles_to_image(tiles, spec.image_size, spec.tile_size)
        want = sil.render_mesh_silhouette(verts, model.faces, cam_t, spec, dense=True)
        np.testing.assert_allclose(np.asarray(img), np.asarray(want), atol=1e-5)

    def test_matches_round1_binned_path(self):
        model, verts, cam_t, spec = _problem(seed=3)
        tiles = sf.silhouette_tiles_fused(verts, model, cam_t, spec)
        img = sf.tiles_to_image(tiles, spec.image_size, spec.tile_size)
        old_spec = spec._replace(backend="xla")
        want = sil.render_mesh_silhouette(verts, model.faces, cam_t, old_spec)
        np.testing.assert_allclose(np.asarray(img), np.asarray(want), atol=1e-5)

    def test_identity_perm_fallback(self):
        model, verts, cam_t, spec = _problem(seed=1)
        model_noperm = dataclasses.replace(model, vertex_perm=None)
        a = sf.silhouette_tiles_fused(verts, model, cam_t, spec)
        b = sf.silhouette_tiles_fused(verts, model_noperm, cam_t, spec)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_tile_roundtrip(self):
        img = jnp.asarray(np.random.default_rng(0).normal(size=(3, 32, 32)).astype(np.float32))
        tiles = sf.image_to_tiles(img, 8)
        back = sf.tiles_to_image(tiles, 32, 8)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(img))


class TestFusedKernelInterpret:
    """The Pallas kernels under interpret mode vs the XLA twin."""

    def _inputs(self, seed=0):
        model, verts, cam_t, spec = _problem(seed=seed)
        bins = sf.compute_fused_bins(verts, model, cam_t, spec)
        verts_screen = camera_lib.project_points_screen(
            verts, cam_t, spec.image_size, spec.focal_length
        )
        tx, ty = sf.build_tables(verts_screen, model.vertex_perm)
        px_to_ndc2 = (2.0 / spec.image_size) ** 2
        inv_sigma = px_to_ndc2 / spec.sigma
        blur_px2 = spec.blur_radius / px_to_ndc2
        return tx, ty, bins, spec, inv_sigma, blur_px2

    def test_fwd_kernel_vs_twin(self):
        tx, ty, bins, spec, inv_sigma, blur_px2 = self._inputs()
        got = sf.fused_tiles_alpha(
            tx, ty, bins.pages, bins.idx, bins.origin,
            spec.tile_size, inv_sigma, blur_px2, sf.dump_page_id(96), 8, True,
        )
        want = sf.fused_tiles_alpha_xla(
            tx, ty, bins.pages, bins.idx, bins.origin,
            spec.tile_size, inv_sigma, blur_px2,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_bwd_kernel_vs_twin_autodiff(self):
        tx, ty, bins, spec, inv_sigma, blur_px2 = self._inputs(seed=2)
        w = jnp.asarray(
            np.random.default_rng(5).normal(size=(tx.shape[0], bins.pages.shape[1],
                                                  spec.tile_size**2)).astype(np.float32)
        )

        def loss_kernel(tx_, ty_):
            out = sf.fused_tiles_alpha(
                tx_, ty_, bins.pages, bins.idx, bins.origin,
                spec.tile_size, inv_sigma, blur_px2, sf.dump_page_id(96), 8, True,
            )
            return jnp.sum(out * w)

        def loss_twin(tx_, ty_):
            out = sf.fused_tiles_alpha_xla(
                tx_, ty_, bins.pages, bins.idx, bins.origin,
                spec.tile_size, inv_sigma, blur_px2,
            )
            return jnp.sum(out * w)

        gk = jax.grad(loss_kernel, argnums=(0, 1))(tx, ty)
        gt = jax.grad(loss_twin, argnums=(0, 1))(tx, ty)
        for a, b in zip(gk, gt):
            # split-bf16 scatter matmul: ~2⁻¹⁷ relative; twin is exact autodiff
            scale = np.abs(np.asarray(b)).max() + 1e-12
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-4 * scale, rtol=2e-4
            )

    def test_grad_reaches_vertices_finite(self):
        model, verts, cam_t, spec = _problem(seed=4)

        def loss(v):
            tiles = sf.silhouette_tiles_fused(v, model, cam_t, spec)
            return jnp.mean(tiles**2)

        g = jax.grad(loss)(verts)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0


class TestCapacityCounters:
    def test_no_overflow_on_healthy_problem(self):
        model, verts, cam_t, spec = _problem()
        bins = sf.compute_fused_bins(verts, model, cam_t, spec)
        assert int(bins.stats.truncated_tiles) == 0
        assert int(bins.stats.dropped_slots) == 0
        assert int(bins.stats.max_faces_per_tile) <= spec.faces_per_tile

    def test_truncation_counted(self):
        model, verts, cam_t, spec = _problem()
        spec = spec._replace(faces_per_tile=1)
        bins = sf.compute_fused_bins(verts, model, cam_t, spec)
        assert int(bins.stats.truncated_tiles) > 0
        assert int(bins.stats.max_faces_per_tile) > 1

    def test_page_overflow_counted_and_spans_clipped(self):
        # needs several pages' worth of vertices for overflow to be possible
        model, verts, cam_t, spec = _problem(num_verts=1024)
        spec = spec._replace(pages_per_tile=2)  # 1 usable page per tile
        bins = sf.compute_fused_bins(verts, model, cam_t, spec)
        assert int(bins.stats.page_overflow_tiles) > 0
        assert int(bins.stats.dropped_slots) > 0
        # and the big-face span counter fires with a tiny cap
        spec2 = spec._replace(max_tiles_per_face=1, pages_per_tile=8)
        bins2 = sf.compute_fused_bins(verts, model, cam_t, spec2)
        assert int(bins2.stats.span_clipped_faces) > 0


class TestFusedLossGradKernel:
    """One-pass loss+grad kernel (interpret mode) vs twin + autodiff."""

    def _inputs(self, seed=4):
        model, verts, cam_t, spec = _problem(seed=seed)
        bins = sf.compute_fused_bins(verts, model, cam_t, spec)
        verts_screen = camera_lib.project_points_screen(
            verts, cam_t, spec.image_size, spec.focal_length
        )
        tx, ty = sf.build_tables(verts_screen, model.vertex_perm)
        px_to_ndc2 = (2.0 / spec.image_size) ** 2
        inv_sigma = px_to_ndc2 / spec.sigma
        blur_px2 = spec.blur_radius / px_to_ndc2
        g2 = bins.pages.shape[1]
        mask = jnp.asarray(
            np.random.default_rng(9).uniform(
                0, 1, size=(tx.shape[0], g2, spec.tile_size**2)
            ).astype(np.float32)
        )
        return tx, ty, bins, spec, inv_sigma, blur_px2, mask

    def test_value_and_grad_vs_twin(self):
        tx, ty, bins, spec, inv_sigma, blur_px2, mask = self._inputs()
        w = jnp.asarray(
            np.random.default_rng(11).uniform(0.5, 1.5, size=(tx.shape[0],)).astype(np.float32)
        )

        def loss_kernel(tx_, ty_):
            err = sf.fused_sq_err(
                tx_, ty_, bins.pages, bins.idx, bins.origin, mask,
                spec.tile_size, inv_sigma, blur_px2, sf.dump_page_id(96), 8, True,
            )
            return jnp.sum(err * w)

        def loss_twin(tx_, ty_):
            tiles = sf.fused_tiles_alpha_xla(
                tx_, ty_, bins.pages, bins.idx, bins.origin,
                spec.tile_size, inv_sigma, blur_px2,
            )
            err = jnp.sum((tiles - mask) ** 2, axis=(-1, -2))
            return jnp.sum(err * w)

        vk, gk = jax.value_and_grad(loss_kernel, argnums=(0, 1))(tx, ty)
        vt, gt = jax.value_and_grad(loss_twin, argnums=(0, 1))(tx, ty)
        np.testing.assert_allclose(float(vk), float(vt), rtol=1e-5)
        for a, b in zip(gk, gt):
            scale = np.abs(np.asarray(b)).max() + 1e-12
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-4 * scale, rtol=2e-4
            )

    def test_empty_tiles_contribute_mask_mass(self):
        tx, ty, bins, spec, inv_sigma, blur_px2, mask = self._inputs(seed=6)
        # Force every tile empty: all page slots point at the dump page.
        dump = sf.dump_page_id(96)
        empty_pages = jnp.full_like(bins.pages, dump)
        err = sf.fused_sq_err(
            tx, ty, empty_pages, bins.idx, bins.origin, mask,
            spec.tile_size, inv_sigma, blur_px2, dump, 8, True,
        )
        want = jnp.sum(mask**2, axis=(-1, -2))
        np.testing.assert_allclose(np.asarray(err), np.asarray(want), rtol=1e-5)

    def test_high_level_entry_matches_tiles_path(self):
        model, verts, cam_t, spec = _problem(seed=7)
        bins = sf.compute_fused_bins(verts, model, cam_t, spec)
        g2 = bins.pages.shape[1]
        mask = jnp.asarray(
            np.random.default_rng(13).uniform(
                0, 1, size=(verts.shape[0], g2, spec.tile_size**2)
            ).astype(np.float32)
        )
        tiles = sf.silhouette_tiles_fused(verts, model, cam_t, spec, bins=bins)
        want = jnp.mean((tiles - mask) ** 2, axis=(-1, -2))
        # CPU: route the sq-err entry through the interpret-mode kernel by
        # calling fused_sq_err directly with the same tables.
        verts_screen = camera_lib.project_points_screen(
            verts, cam_t, spec.image_size, spec.focal_length
        )
        tx, ty = sf.build_tables(verts_screen, model.vertex_perm)
        px_to_ndc2 = (2.0 / spec.image_size) ** 2
        err = sf.fused_sq_err(
            tx, ty, bins.pages, bins.idx, bins.origin, mask,
            spec.tile_size, px_to_ndc2 / spec.sigma,
            spec.blur_radius / px_to_ndc2, sf.dump_page_id(96), 8, True,
        ) / float(spec.image_size**2)
        np.testing.assert_allclose(np.asarray(err), np.asarray(want), rtol=2e-4, atol=1e-7)
