"""Refinement-engine property tests (SURVEY §4): ground truth is recoverable by
construction on synthetic data generated from the model itself."""

import numpy as np
import jax
import jax.numpy as jnp
import dataclasses

from jrr_tpu.config import RefinerConfig, SilhouetteConfig
from jrr_tpu.models import smpl as smpl_mod
from jrr_tpu.models import discriminator as disc_lib
from jrr_tpu.ops import jreg as jreg_lib, rotations
from jrr_tpu.refine import engine, losses
from jrr_tpu.render import silhouette as sil_lib
from jrr_tpu.evals import metrics


def _setup(seed=0, batch=4, num_verts=96):
    model = smpl_mod.synthetic_smpl_model(seed=seed, num_verts=num_verts, num_faces=160)
    rng = np.random.default_rng(seed)
    # A 17-row evaluation regressor: sparse nonneg rows.
    j_reg = np.zeros((17, num_verts), np.float32)
    for j in range(17):
        idx = rng.choice(num_verts, size=6, replace=False)
        j_reg[j, idx] = rng.uniform(0.5, 1.0, size=6)
    j_reg = jnp.asarray(j_reg)

    key = jax.random.PRNGKey(seed)
    gt = losses.FrameParams(
        pose6d=rotations.rotmat_to_rot6d(rotations.random_rotmat(key, (batch, 23))) * 1.0,
        orient6d=rotations.rotmat_to_rot6d(
            rotations.random_rotmat(jax.random.PRNGKey(seed + 1), (batch, 1))
        ),
        betas=jnp.asarray(rng.normal(scale=0.5, size=(batch, 10)).astype(np.float32)),
        cam_t=jnp.asarray(
            np.stack(
                [
                    rng.uniform(-0.2, 0.2, batch),
                    rng.uniform(-0.2, 0.2, batch),
                    rng.uniform(25.0, 30.0, batch),
                ],
                axis=-1,
            ).astype(np.float32)
        ),
    )
    return model, j_reg, gt


def _gt_data(model, j_reg, gt, cfg, with_mask=False):
    out = losses.forward_frame(model, gt)
    joints = losses.joints_from_verts(jreg_lib.normalize_jreg(j_reg), out.vertices)
    gt_j2d = losses.reproject_joints(joints, gt.cam_t, cfg)
    gt_j3d = joints * 1000.0  # mm, exactly consistent
    mask = None
    if with_mask:
        spec = sil_lib.RasterizerSpec(
            image_size=cfg.silhouette.image_size,
            sigma=cfg.silhouette.sigma,
            blur_radius=cfg.silhouette.blur_radius,
            tile_size=cfg.silhouette.tile_size,
            faces_per_tile=cfg.silhouette.faces_per_tile,
            focal_length=cfg.camera.focal_length,
        )
        mask = sil_lib.render_mesh_silhouette(out.vertices, model.faces, gt.cam_t, spec)
    return losses.FrameBatch(gt_j2d=gt_j2d, gt_j3d=gt_j3d, mask=mask)


def _perturb(gt, scale, seed=7):
    rng = np.random.default_rng(seed)

    def noise(x, s):
        return x + jnp.asarray(rng.normal(scale=s, size=x.shape).astype(np.float32))

    return losses.FrameParams(
        pose6d=noise(gt.pose6d, scale),
        orient6d=noise(gt.orient6d, scale * 0.5),
        betas=noise(gt.betas, scale),
        cam_t=noise(gt.cam_t, scale),
    )


class TestStageA:
    def test_camera_recovery(self):
        cfg = dataclasses.replace(
            RefinerConfig(), stage_a_steps=300, stage_b_steps=0,
            use_silhouette=False, use_discriminators=False,
        )
        model, j_reg, gt = _setup()
        data = _gt_data(model, j_reg, gt, cfg)
        init = gt._replace(cam_t=gt.cam_t + jnp.asarray([0.3, -0.4, 2.0]))

        res = jax.jit(
            lambda i, d: engine.refine_batch(model, j_reg, i, d, cfg)
        )(init, data)
        assert float(res.stage_a_loss[-1]) < float(res.stage_a_loss[0]) * 1e-2
        # x/y recover tightly; depth is only weakly observable from 2D
        # reprojection (scale-depth ambiguity), so it converges much slower —
        # the reference runs 1000 steps for the same reason.
        np.testing.assert_allclose(
            np.asarray(res.params.cam_t[:, :2]), np.asarray(gt.cam_t[:, :2]), atol=0.1
        )


class TestStageB:
    def test_j3d_recovery(self):
        cfg = dataclasses.replace(
            RefinerConfig(), stage_a_steps=100, stage_b_steps=150,
            use_silhouette=False, use_discriminators=False,
        )
        model, j_reg, gt = _setup()
        data = _gt_data(model, j_reg, gt, cfg)
        init = _perturb(gt, 0.10)

        res = jax.jit(lambda i, d: engine.refine_batch(model, j_reg, i, d, cfg))(init, data)
        j3d_first = float(res.stage_b_terms.j3d[0])
        j3d_last = float(res.stage_b_terms.j3d[-1])
        assert j3d_last < j3d_first * 0.35, (j3d_first, j3d_last)

        # MPJPE improves vs the initialization.
        out_init = losses.forward_frame(model, init)
        j_init = losses.joints_from_verts(jreg_lib.normalize_jreg(j_reg), out_init.vertices)
        before = metrics.evaluate(j_init, data.gt_j3d)
        after = metrics.evaluate(res.joints3d, data.gt_j3d)
        assert float(after.mpjpe) < float(before.mpjpe)

    def test_full_loss_with_silhouette_and_disc(self):
        cfg = dataclasses.replace(
            RefinerConfig(),
            stage_a_steps=20, stage_b_steps=25,
            silhouette=SilhouetteConfig(
                image_size=32, tile_size=8, faces_per_tile=64,
                sigma=5e-3, blur_radius=0.05,
            ),
        )
        model, j_reg, gt = _setup(batch=2)
        data = _gt_data(model, j_reg, gt, cfg, with_mask=True)
        init = _perturb(gt, 0.05)
        pd = disc_lib.init_pose_discriminator(jax.random.PRNGKey(10))
        sd = disc_lib.init_shape_discriminator(jax.random.PRNGKey(11))

        res = jax.jit(
            lambda i, d: engine.refine_batch(
                model, j_reg, i, d, cfg, pose_disc_params=pd, shape_disc_params=sd
            )
        )(init, data)
        total = np.asarray(res.stage_b_terms.total)
        assert np.all(np.isfinite(total))
        assert total[-1] < total[0]
        sil = np.asarray(res.stage_b_terms.silhouette)
        assert sil[-1] <= sil[0] * 1.5  # silhouette should not blow up

    def test_coarse_to_fine_silhouette(self):
        """coarse_frac chains a low-res stage-B phase into the full-res one
        inside one jitted program: result shapes match the single-resolution
        run, the loss stays finite and decreasing, and validation is loud."""
        import pytest

        sil = SilhouetteConfig(
            image_size=32, tile_size=8, faces_per_tile=64,
            sigma=5e-3, blur_radius=0.05,
            coarse_frac=0.4, coarse_factor=2, coarse_min_image=16,
            rebin_interval=5,
        )
        cfg = dataclasses.replace(
            RefinerConfig(), stage_a_steps=20, stage_b_steps=25, silhouette=sil
        )
        model, j_reg, gt = _setup(batch=2)
        data = _gt_data(model, j_reg, gt, cfg, with_mask=True)
        init = _perturb(gt, 0.05)
        pd = disc_lib.init_pose_discriminator(jax.random.PRNGKey(10))
        sd = disc_lib.init_shape_discriminator(jax.random.PRNGKey(11))

        res = jax.jit(
            lambda i, d: engine.refine_batch(
                model, j_reg, i, d, cfg, pose_disc_params=pd, shape_disc_params=sd
            )
        )(init, data)
        # Phase terms concatenate to the full stage-B length.
        total = np.asarray(res.stage_b_terms.total)
        assert total.shape == (25,)
        assert np.all(np.isfinite(total))
        assert total[-1] < total[0]
        assert np.asarray(res.stage_a_loss).shape == (20,)
        # Capacity counters survive the phase merge.
        assert res.bin_stats is not None
        assert int(res.bin_stats.max_faces_per_tile) > 0

        # Loud validation: coarse_frac out of range / non-dividing factor.
        bad = dataclasses.replace(
            cfg, silhouette=dataclasses.replace(sil, coarse_frac=1.0)
        )
        with pytest.raises(ValueError, match="coarse_frac"):
            engine.refine_batch(model, j_reg, init, data, bad)
        bad = dataclasses.replace(
            cfg,
            silhouette=dataclasses.replace(
                sil, coarse_factor=3, coarse_min_image=8
            ),
        )
        with pytest.raises(ValueError, match="divide"):
            engine.refine_batch(model, j_reg, init, data, bad)

        # Below the quality floor the engine falls back to single-resolution
        # (no phase split: one stage-B scan of the full length).
        floor = dataclasses.replace(
            cfg, silhouette=dataclasses.replace(sil, coarse_min_image=64)
        )
        res_sr = engine.refine_batch(model, j_reg, init, data, floor)
        assert np.asarray(res_sr.stage_b_terms.total).shape == (25,)

    def test_coarse_step_stride(self):
        """coarse_step_stride strides only the coarse c2f phase: None is
        bit-identical to an explicit equal stride, and a sparser coarse
        stride still refines finitely with the full stage-B term record."""
        sil = SilhouetteConfig(
            image_size=32, tile_size=8, faces_per_tile=64,
            sigma=5e-3, blur_radius=0.05,
            coarse_frac=0.4, coarse_factor=2, coarse_min_image=16,
            rebin_interval=5, step_stride=2, coarse_step_stride=None,
        )
        cfg = dataclasses.replace(
            RefinerConfig(), stage_a_steps=5, stage_b_steps=20, silhouette=sil
        )
        model, j_reg, gt = _setup(batch=2)
        data = _gt_data(model, j_reg, gt, cfg, with_mask=True)
        init = _perturb(gt, 0.05)

        run = lambda c: jax.jit(
            lambda i, d: engine.refine_batch(model, j_reg, i, d, c)
        )(init, data)
        res_none = run(cfg)
        res_same = run(
            dataclasses.replace(
                cfg, silhouette=dataclasses.replace(sil, coarse_step_stride=2)
            )
        )
        np.testing.assert_array_equal(
            np.asarray(res_none.joints3d), np.asarray(res_same.joints3d)
        )

        res4 = run(
            dataclasses.replace(
                cfg, silhouette=dataclasses.replace(sil, coarse_step_stride=4)
            )
        )
        total = np.asarray(res4.stage_b_terms.total)
        assert total.shape == (20,)
        assert np.all(np.isfinite(total))
        # The sparser coarse stride changes the coarse-phase trajectory.
        assert not np.array_equal(np.asarray(res4.joints3d), np.asarray(res_none.joints3d))

    def test_fine_warm_stride_schedule(self):
        """fine_warm_* schedules the FINE-phase stride inside one scan: the
        silhouette term record shows the warm cadence then the polish
        cadence, active steps carry the current-stride scale, and a
        warm_stride equal to step_stride matches the unscheduled run."""
        sil = SilhouetteConfig(
            image_size=32, tile_size=8, faces_per_tile=64,
            sigma=5e-3, blur_radius=0.05,
            coarse_frac=0.0, rebin_interval=5, step_stride=2,
            coarse_step_stride=None,
        )
        cfg = dataclasses.replace(
            RefinerConfig(), stage_a_steps=5, stage_b_steps=20, silhouette=sil
        )
        model, j_reg, gt = _setup(batch=2)
        data = _gt_data(model, j_reg, gt, cfg, with_mask=True)
        init = _perturb(gt, 0.05)

        run = lambda c: jax.jit(
            lambda i, d: engine.refine_batch(model, j_reg, i, d, c)
        )(init, data)

        # warm_stride == step_stride: same active pattern and scale as the
        # unscheduled run (traced vs static stride, numerically identical).
        res_plain = run(cfg)
        res_same = run(
            dataclasses.replace(
                cfg,
                silhouette=dataclasses.replace(
                    sil, fine_warm_frac=0.5, fine_warm_stride=2
                ),
            )
        )
        np.testing.assert_allclose(
            np.asarray(res_same.joints3d), np.asarray(res_plain.joints3d),
            rtol=1e-5, atol=1e-6,
        )

        # warm stride 4 over the first half: silhouette term fires on steps
        # {0,4,8} (warm, ×4) then {10,12,...,18} (polish, ×2), zero elsewhere.
        res_warm = run(
            dataclasses.replace(
                cfg,
                silhouette=dataclasses.replace(
                    sil, fine_warm_frac=0.5, fine_warm_stride=4
                ),
            )
        )
        sil_terms = np.asarray(res_warm.stage_b_terms.silhouette)
        assert sil_terms.shape == (20,)
        active = {0, 4, 8} | set(range(10, 20, 2))
        for t in range(20):
            if t in active:
                assert sil_terms[t] != 0.0, f"step {t} should rasterize"
            else:
                assert sil_terms[t] == 0.0, f"step {t} should skip"
        assert np.all(np.isfinite(np.asarray(res_warm.stage_b_terms.total)))

    def test_empty_mask_frame_stays_finite(self):
        """A frame whose mask is all background (person-segmentation failure:
        the reference would feed an all-zero pixel_annotation the same way)
        must refine to finite params through the silhouette + c2f path —
        the loss pulls coverage toward zero but must never NaN."""
        sil = SilhouetteConfig(
            image_size=32, tile_size=8, faces_per_tile=64,
            sigma=5e-3, blur_radius=0.05,
            coarse_frac=0.4, coarse_factor=2, coarse_min_image=16,
            rebin_interval=5,
        )
        cfg = dataclasses.replace(
            RefinerConfig(), stage_a_steps=5, stage_b_steps=10, silhouette=sil
        )
        model, j_reg, gt = _setup(batch=2)
        data = _gt_data(model, j_reg, gt, cfg, with_mask=True)
        # Frame 0 keeps its true mask; frame 1 loses the person entirely.
        data = data._replace(mask=data.mask.at[1].set(0.0))
        init = _perturb(gt, 0.05)

        res = jax.jit(
            lambda i, d: engine.refine_batch(model, j_reg, i, d, cfg)
        )(init, data)
        for leaf in jax.tree.leaves(res.params):
            assert np.all(np.isfinite(np.asarray(leaf)))
        assert np.all(np.isfinite(np.asarray(res.stage_b_terms.total)))

    def test_freeze_hand_feet(self):
        cfg = dataclasses.replace(
            RefinerConfig(), stage_a_steps=5, stage_b_steps=10,
            use_silhouette=False, use_discriminators=False,
        )
        model, j_reg, gt = _setup(batch=2)
        data = _gt_data(model, j_reg, gt, cfg)
        init = _perturb(gt, 0.05)
        res = engine.refine_batch(model, j_reg, init, data, cfg, freeze_hand_feet=True)
        from jrr_tpu import constants

        idx = np.asarray(constants.HAND_FEET_ROT_INDICES)
        np.testing.assert_allclose(
            np.asarray(res.params.pose6d[:, idx]), np.asarray(init.pose6d[:, idx]), atol=1e-6
        )


def test_spin_prediction_to_params():
    pose6d = jnp.zeros((3, 24, 6))
    betas = jnp.zeros((3, 10))
    cam = jnp.asarray([[1.0, 0.2, -0.1]] * 3)
    p = engine.spin_prediction_to_params(pose6d, betas, cam)
    assert p.pose6d.shape == (3, 23, 6)
    assert p.orient6d.shape == (3, 1, 6)
    np.testing.assert_allclose(p.cam_t[0], [-0.4, 0.2, 2 * 5000 / (224 + 1e-9)], rtol=1e-4)
