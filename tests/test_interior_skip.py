"""Interior-saturated-tile skip (silhouette_fused.apply_interior_skip).

The skip marks α-saturated tiles kernel-empty at rebin time — the
"fewer occupied tiles" lever from the round-3 in-kernel cost attribution
(BASELINE.md). These tests pin the safety contract on the CPU XLA twin:
alpha, loss value, and vertex gradients are unchanged (up to the f32
saturation threshold) and the skip is never silent
(BinStats.interior_skipped_tiles)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from jrr_tpu.config import RefinerConfig, SilhouetteConfig
from jrr_tpu.models import discriminator as disc_lib
from jrr_tpu.models import smpl as smpl_mod
from jrr_tpu.refine import engine, losses
from jrr_tpu.render import silhouette as sil
from jrr_tpu.render import silhouette_fused as sf


def _problem(batch=2, num_verts=96, image=64, seed=0):
    """A dense triangle-soup blob: its interior tiles genuinely saturate at
    α≡1 on a G=8 grid (the thin synthetic T-pose body never does at 64²), so
    the sat-tile correction path is exercised, not just the α≡0 one."""
    model = smpl_mod.synthetic_smpl_model(seed=seed, num_verts=num_verts, num_faces=160)
    rng = np.random.default_rng(seed)
    verts = jnp.asarray(
        rng.normal(scale=0.35, size=(batch, num_verts, 3)).astype(np.float32)
    )
    cam_t = jnp.asarray(
        np.stack(
            [rng.uniform(-0.05, 0.05, batch), rng.uniform(-0.05, 0.05, batch),
             rng.uniform(58, 66, batch)], axis=-1,
        ).astype(np.float32)
    )
    spec = sil.RasterizerSpec(
        image_size=image, tile_size=8, faces_per_tile=64,
        sigma=1e-4, blur_radius=2e-4, bin_margin_px=8.0,
    )
    return model, verts, cam_t, spec


def _mask_tiles(model, cam_t, spec, seed=5):
    """A plausible GT mask: hard threshold of a shifted blob's render."""
    rng = np.random.default_rng(seed)
    verts = jnp.asarray(
        rng.normal(scale=0.38, size=(cam_t.shape[0], model.num_verts, 3)).astype(np.float32)
    )
    tiles = sf.silhouette_tiles_fused(verts, model, cam_t, spec)
    return (tiles > 0.5).astype(jnp.float32)


class TestErode:
    def test_erode_keeps_only_full_neighborhoods(self):
        g = 6
        flag = np.zeros((1, g, g), bool)
        flag[0, 1:5, 1:5] = True  # 4x4 block
        out = sf._erode_tiles(jnp.asarray(flag.reshape(1, -1)), g, 1)
        out = np.asarray(out).reshape(g, g)
        want = np.zeros((g, g), bool)
        want[2:4, 2:4] = True  # only the 2x2 core survives radius-1 erosion
        np.testing.assert_array_equal(out, want)

    def test_border_counts_as_false(self):
        g = 4
        flag = np.ones((1, g, g), bool)  # all True, but grid edge is unsafe
        out = np.asarray(sf._erode_tiles(jnp.asarray(flag.reshape(1, -1)), g, 1)).reshape(g, g)
        want = np.zeros((g, g), bool)
        want[1:3, 1:3] = True
        np.testing.assert_array_equal(out, want)


class TestSkipParity:
    def test_marks_tiles_and_preserves_alpha(self):
        model, verts, cam_t, spec = _problem()
        bins = sf.compute_fused_bins(verts, model, cam_t, spec)
        skip_bins = sf.apply_interior_skip(bins, verts, model, cam_t, spec)

        n_skip = int(skip_bins.stats.interior_skipped_tiles)
        assert n_skip > 0, "scene must be big enough for the lever to engage"
        assert int(skip_bins.stats.dropped_slots) == int(bins.stats.dropped_slots)

        a = sf.silhouette_tiles_fused(verts, model, cam_t, spec, bins=bins)
        b = sf.silhouette_tiles_fused(verts, model, cam_t, spec, bins=skip_bins)
        # Saturated tiles are replaced by exact 0/1 — within the threshold.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)

        # sat_tiles really are the α≡1 tiles.
        sat = np.asarray(skip_bins.sat_tiles)
        tiles = np.asarray(a)
        assert sat.any()
        assert np.all(tiles[sat] >= 1.0 - 1e-6)

    def test_loss_value_parity(self):
        model, verts, cam_t, spec = _problem(seed=1)
        mask_tiles = _mask_tiles(model, cam_t, spec)
        bins = sf.compute_fused_bins(verts, model, cam_t, spec)
        skip_bins = sf.apply_interior_skip(bins, verts, model, cam_t, spec)
        assert int(skip_bins.stats.interior_skipped_tiles) > 0

        e0 = sf.silhouette_sq_err_fused(verts, model, cam_t, mask_tiles, spec, bins=bins)
        e1 = sf.silhouette_sq_err_fused(
            verts, model, cam_t, mask_tiles, spec, bins=skip_bins
        )
        np.testing.assert_allclose(np.asarray(e0), np.asarray(e1), atol=1e-6, rtol=1e-5)

    def test_gradient_parity(self):
        model, verts, cam_t, spec = _problem(seed=2)
        mask_tiles = _mask_tiles(model, cam_t, spec, seed=9)
        bins = sf.compute_fused_bins(verts, model, cam_t, spec)
        skip_bins = sf.apply_interior_skip(bins, verts, model, cam_t, spec)
        assert int(skip_bins.stats.interior_skipped_tiles) > 0

        def loss(v, b):
            return jnp.sum(
                sf.silhouette_sq_err_fused(v, model, cam_t, mask_tiles, spec, bins=b)
            )

        g0 = jax.grad(loss)(verts, bins)
        g1 = jax.grad(loss)(verts, skip_bins)
        scale = float(jnp.max(jnp.abs(g0))) + 1e-12
        np.testing.assert_allclose(
            np.asarray(g1) / scale, np.asarray(g0) / scale, atol=1e-5
        )


class TestEngineIntegration:
    def _cfg(self, interior_skip, stage_b=5):
        return dataclasses.replace(
            RefinerConfig(),
            stage_a_steps=10, stage_b_steps=stage_b,
            silhouette=SilhouetteConfig(
                image_size=64, tile_size=8, faces_per_tile=64,
                sigma=1e-4, blur_radius=2e-4,
                rebin_interval=5, bin_margin_px=8.0,
                step_stride=1, coarse_frac=0.0,
                interior_skip=interior_skip,
            ),
        )

    def test_one_chunk_trajectory_identical(self):
        """Within one rebin chunk the skip must not move the optimization:
        the skipped tiles' gradients are numerically zero by saturation."""
        from tests.test_engine import _gt_data, _perturb, _setup

        model, j_reg, gt = _setup(batch=2)
        cfg0 = self._cfg(False)
        cfg1 = self._cfg(True)
        data = _gt_data(model, j_reg, gt, cfg0, with_mask=True)
        init = _perturb(gt, 0.05)
        pd = disc_lib.init_pose_discriminator(jax.random.PRNGKey(10))
        sd = disc_lib.init_shape_discriminator(jax.random.PRNGKey(11))

        r0 = jax.jit(
            lambda i, d: engine.refine_batch(model, j_reg, i, d, cfg0, pd, sd)
        )(init, data)
        r1 = jax.jit(
            lambda i, d: engine.refine_batch(model, j_reg, i, d, cfg1, pd, sd)
        )(init, data)
        assert int(r1.bin_stats.interior_skipped_tiles) > 0
        assert int(r0.bin_stats.interior_skipped_tiles) == 0
        for a, b in zip(jax.tree.leaves(r0.params), jax.tree.leaves(r1.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_auto_engages_on_fused_and_stays_off_elsewhere(self):
        """interior_skip=None (the shipped default) is AUTO: on when the
        fused amortized path is active, silently off (no raise) when it
        isn't — unlike explicit True, which must raise there."""
        from tests.test_engine import _gt_data, _perturb, _setup

        model, j_reg, gt = _setup(batch=2)
        cfg_auto = self._cfg(None)
        data = _gt_data(model, j_reg, gt, cfg_auto, with_mask=True)
        init = _perturb(gt, 0.05)
        res = jax.jit(
            lambda i, d: engine.refine_batch(model, j_reg, i, d, cfg_auto)
        )(init, data)
        assert int(res.bin_stats.interior_skipped_tiles) > 0

        cfg_xla = dataclasses.replace(
            cfg_auto, silhouette=dataclasses.replace(
                cfg_auto.silhouette, backend="xla"
            )
        )
        res2 = jax.jit(
            lambda i, d: engine.refine_batch(model, j_reg, i, d, cfg_xla)
        )(init, data)  # no raise; the non-fused path has no skip to honor
        assert res2.bin_stats is None
        assert np.all(np.isfinite(np.asarray(res2.stage_b_terms.total)))

    def test_loud_error_when_skip_cannot_apply(self):
        """Never-silent: interior_skip on a path that can't honor it raises."""
        import pytest

        from tests.test_engine import _gt_data, _perturb, _setup

        model, j_reg, gt = _setup(batch=2)
        base = self._cfg(True)
        data = _gt_data(model, j_reg, gt, base, with_mask=True)
        init = _perturb(gt, 0.05)
        for bad in (
            dataclasses.replace(
                base, silhouette=dataclasses.replace(
                    base.silhouette, rebin_interval=1
                )
            ),
            dataclasses.replace(
                base, silhouette=dataclasses.replace(
                    base.silhouette, backend="xla"
                )
            ),
        ):
            with pytest.raises(ValueError, match="interior_skip"):
                engine.refine_batch(model, j_reg, init, data, bad)

    def test_longer_run_stays_finite_and_skips(self):
        from tests.test_engine import _gt_data, _perturb, _setup

        model, j_reg, gt = _setup(batch=2, seed=3)
        cfg = self._cfg(True, stage_b=20)
        data = _gt_data(model, j_reg, gt, cfg, with_mask=True)
        init = _perturb(gt, 0.08)
        res = jax.jit(
            lambda i, d: engine.refine_batch(model, j_reg, i, d, cfg)
        )(init, data)
        total = np.asarray(res.stage_b_terms.total)
        assert np.all(np.isfinite(total))
        assert total[-1] < total[0]
        assert int(res.bin_stats.interior_skipped_tiles) > 0
