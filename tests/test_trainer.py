"""Outer-loop trainer tests: state updates, metric sanity, lstsq regressor fit."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from jrr_tpu.config import PipelineConfig, RefinerConfig
from jrr_tpu.models import smpl as smpl_mod
from jrr_tpu.ops import jreg as jreg_lib, rotations
from jrr_tpu.refine import engine, losses, trainer


def _small_cfg():
    return dataclasses.replace(
        PipelineConfig(),
        refiner=dataclasses.replace(
            RefinerConfig(),
            stage_a_steps=10, stage_b_steps=15,
            use_silhouette=False, use_discriminators=True,
        ),
    )


def _setup(batch=3, num_verts=96, seed=0):
    model = smpl_mod.synthetic_smpl_model(seed=seed, num_verts=num_verts, num_faces=120)
    rng = np.random.default_rng(seed)
    j_reg = np.zeros((17, num_verts), np.float32)
    for j in range(17):
        idx = rng.choice(num_verts, size=6, replace=False)
        j_reg[j, idx] = rng.uniform(0.5, 1.0, size=6)
    j_reg = jnp.asarray(j_reg)

    gt = losses.FrameParams(
        pose6d=rotations.rotmat_to_rot6d(
            rotations.random_rotmat(jax.random.PRNGKey(seed), (batch, 23))
        ),
        orient6d=rotations.rotmat_to_rot6d(
            rotations.random_rotmat(jax.random.PRNGKey(seed + 1), (batch, 1))
        ),
        betas=jnp.asarray(rng.normal(scale=0.5, size=(batch, 10)).astype(np.float32)),
        cam_t=jnp.asarray(
            np.stack([rng.uniform(-0.1, 0.1, batch), rng.uniform(-0.1, 0.1, batch),
                      rng.uniform(25, 30, batch)], axis=-1).astype(np.float32)
        ),
    )
    out = losses.forward_frame(model, gt)
    joints = jreg_lib.apply_jreg(jreg_lib.normalize_jreg(j_reg), out.vertices)
    cfg = _small_cfg()
    data = losses.FrameBatch(
        gt_j2d=losses.reproject_joints(joints, gt.cam_t, cfg.refiner),
        gt_j3d=joints * 1000.0,
        mask=None,
    )

    def noise(x, s):
        return x + jnp.asarray(rng.normal(scale=s, size=x.shape).astype(np.float32))

    init = losses.FrameParams(
        pose6d=noise(gt.pose6d, 0.08), orient6d=noise(gt.orient6d, 0.04),
        betas=noise(gt.betas, 0.1), cam_t=noise(gt.cam_t, 0.1),
    )
    return model, j_reg, gt, init, data, cfg


class TestOuterStep:
    def test_updates_all_state(self):
        model, j_reg, gt, init, data, cfg = _setup()
        # Perturb the regressor so the jreg step has something to fix.
        j_reg_perturbed = j_reg + 0.05 * jnp.abs(
            jax.random.normal(jax.random.PRNGKey(9), j_reg.shape)
        )
        state = trainer.init_train_state(jax.random.PRNGKey(0), j_reg_perturbed, cfg)

        step = jax.jit(
            lambda s, i, d: trainer.outer_step(s, model, i, d, cfg),
        )
        new_state, m, result = step(state, init, data)

        assert int(new_state.step) == 1
        assert float(jnp.sum(jnp.abs(new_state.j_reg_raw - state.j_reg_raw))) > 0
        assert float(
            jnp.sum(jnp.abs(new_state.pose_disc["w1"] - state.pose_disc["w1"]))
        ) > 0
        for name in m._fields:
            assert np.isfinite(float(getattr(m, name))), name

        # Refinement improved on the SPIN init.
        assert float(m.mpjpe_before_jreg_step) < float(m.mpjpe_init)

    def test_final_metrics_average_over_stride_window(self):
        # Under silhouette step-striding the trajectory carries a sawtooth at
        # the stride cadence, so the "final" stage-B metrics average the last
        # `step_stride` steps instead of sampling a stride-boundary [-1]
        # (VERDICT r4 item 7). At stride 1 this reduces to [-1] exactly.
        model, j_reg, gt, init, data, cfg = _setup()
        state = trainer.init_train_state(jax.random.PRNGKey(0), j_reg, cfg)

        # use_silhouette=False → tail window 1 → metric is exactly [-1].
        _, m, result = trainer.outer_step(state, model, init, data, cfg)
        np.testing.assert_allclose(
            float(m.joint_loss), float(result.stage_b_terms.j3d[-1]), rtol=1e-6
        )

        # use_silhouette=True (stride 2 default) → metric is the mean of the
        # last 2 steps. mask=None keeps the silhouette term itself inert, so
        # this isolates the metric-sampling logic.
        cfg_s = dataclasses.replace(
            cfg, refiner=dataclasses.replace(cfg.refiner, use_silhouette=True)
        )
        assert cfg_s.refiner.silhouette.step_stride == 2
        _, m2, result2 = trainer.outer_step(state, model, init, data, cfg_s)
        np.testing.assert_allclose(
            float(m2.joint_loss),
            float(jnp.mean(result2.stage_b_terms.j3d[-2:])),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            float(m2.pose_disc_gen_loss),
            float(jnp.mean(result2.stage_b_terms.pose_disc[-2:])),
            rtol=1e-6,
        )

    def test_fine_warm_stride_validation(self):
        import pytest

        model, j_reg, gt, init, data, cfg = _setup()
        bad = dataclasses.replace(
            cfg.refiner,
            use_silhouette=True,
            silhouette=dataclasses.replace(
                cfg.refiner.silhouette, fine_warm_frac=0.5, fine_warm_stride=0
            ),
        )
        with pytest.raises(ValueError, match="fine_warm_stride"):
            engine.refine_batch(model, j_reg, init, data, bad)

    def test_jreg_step_reduces_supervision_loss(self):
        model, j_reg, gt, init, data, cfg = _setup()
        j_reg_perturbed = j_reg + 0.05 * jnp.abs(
            jax.random.normal(jax.random.PRNGKey(9), j_reg.shape)
        )
        state = trainer.init_train_state(jax.random.PRNGKey(0), j_reg_perturbed, cfg)
        # Run a few outer steps; the regressor supervision error should go down.
        step = jax.jit(lambda s, i, d: trainer.outer_step(s, model, i, d, cfg))
        errs = []
        for _ in range(5):
            state, m, _ = step(state, init, data)
            errs.append(float(m.j_regressor_error))
        assert errs[-1] < errs[0]


class TestLstsqFit:
    def test_recovers_joint_function(self):
        # gt_j3d generated by a hidden regressor from many frames; the ridge
        # fit must reproduce the joint mapping on those frames.
        model, j_reg_star, gt, init, data, cfg = _setup(batch=2)
        num_verts = model.num_verts
        rng = np.random.default_rng(5)
        B = 60
        params = losses.FrameParams(
            pose6d=rotations.rotmat_to_rot6d(
                rotations.random_rotmat(jax.random.PRNGKey(7), (B, 23))
            ),
            orient6d=rotations.rotmat_to_rot6d(
                rotations.random_rotmat(jax.random.PRNGKey(8), (B, 1))
            ),
            betas=jnp.asarray(rng.normal(scale=0.5, size=(B, 10)).astype(np.float32)),
            cam_t=jnp.zeros((B, 3)),
        )
        verts = losses.forward_frame(model, params).vertices
        j_star_norm = jreg_lib.normalize_jreg(j_reg_star)
        joints_star = jreg_lib.apply_jreg(j_star_norm, verts)  # meters
        gt_mm = joints_star * 1000.0
        pelvis_ref = joints_star[:, :1]

        acc = trainer.JRegLstsqAccumulator.zero(num_verts)
        # accumulate in two chunks to exercise the summation contract
        acc = trainer.jreg_lstsq_accumulate(acc, verts[:30], gt_mm[:30], pelvis_ref[:30])
        acc = trainer.jreg_lstsq_accumulate(acc, verts[30:], gt_mm[30:], pelvis_ref[30:])
        w = trainer.jreg_lstsq_solve(acc, ridge=1e-8)

        joints_fit = jreg_lib.apply_jreg(jreg_lib.normalize_jreg(w), verts)
        err_mm = float(jnp.sqrt(jnp.mean((joints_fit - joints_star) ** 2))) * 1000
        assert err_mm < 1.0, err_mm  # sub-millimeter function recovery
        # The fit lives in the deployed class: rows are already stochastic,
        # so eval-time normalize_jreg is a numerical no-op.
        np.testing.assert_allclose(np.asarray(w.sum(axis=1)), 1.0, atol=1e-4)
        assert float(jnp.min(w)) >= 0.0

    def test_fit_matches_deployed_semantics_off_span(self):
        """When gt_j3d is NOT exactly reachable by any simplex regressor of
        the given vertices (the real pipeline: mocap GT vs refined verts),
        a w>=0-only fit picks row sums != 1 and the eval-time row
        normalization (reference find_joints, scripts/utils.py:87-92)
        rescales that joint's position — raw MPJPE pays while Procrustes
        hides it. The simplex-projected fit must beat the ReLU-projected
        unconstrained solve under DEPLOYED (normalized) evaluation."""
        model, j_reg_star, gt, init, data, cfg = _setup(batch=2)
        num_verts = model.num_verts
        rng = np.random.default_rng(11)
        B = 60
        params = losses.FrameParams(
            pose6d=rotations.rotmat_to_rot6d(
                rotations.random_rotmat(jax.random.PRNGKey(17), (B, 23))
            ),
            orient6d=rotations.rotmat_to_rot6d(
                rotations.random_rotmat(jax.random.PRNGKey(18), (B, 1))
            ),
            betas=jnp.asarray(rng.normal(scale=0.5, size=(B, 10)).astype(np.float32)),
            cam_t=jnp.zeros((B, 3)),
        )
        verts = losses.forward_frame(model, params).vertices
        j_star_norm = jreg_lib.normalize_jreg(j_reg_star)
        # Push GT off the simplex span: a 3% global scale + additive noise.
        joints_star = jreg_lib.apply_jreg(j_star_norm, verts) * 1.03
        joints_star = joints_star + jnp.asarray(
            rng.normal(scale=0.004, size=joints_star.shape).astype(np.float32)
        )
        gt_mm = joints_star * 1000.0
        pelvis_ref = joints_star[:, :1]

        acc = trainer.JRegLstsqAccumulator.zero(num_verts)
        acc = trainer.jreg_lstsq_accumulate(acc, verts, gt_mm, pelvis_ref)
        w_simplex = trainer.jreg_lstsq_solve(acc, ridge=1e-8)

        # The w>=0-only baseline this replaces: ridge solve + ReLU.
        n = jnp.maximum(acc.count, 1.0)
        a = acc.gram / n + 1e-8 * jnp.eye(num_verts)
        w_nonneg = jnp.maximum(
            jax.scipy.linalg.solve(a, acc.rhs / n, assume_a="pos"), 0.0
        ).T

        def deployed_err(w):
            jfit = jreg_lib.apply_jreg(jreg_lib.normalize_jreg(w), verts)
            return float(jnp.sqrt(jnp.mean((jfit - joints_star) ** 2)))

        assert deployed_err(w_simplex) < deployed_err(w_nonneg), (
            deployed_err(w_simplex), deployed_err(w_nonneg)
        )
        np.testing.assert_allclose(
            np.asarray(w_simplex.sum(axis=1)), 1.0, atol=1e-4
        )

    def test_simplex_projection(self):
        """Column projection: feasible points are fixed; results are feasible
        and match a tiny brute-force QP on random 3-vectors."""
        from jrr_tpu.refine.trainer import _project_columns_to_simplex

        feas = jnp.asarray([[0.2, 1.0], [0.3, 0.0], [0.5, 0.0]])
        np.testing.assert_allclose(
            np.asarray(_project_columns_to_simplex(feas)), np.asarray(feas),
            atol=1e-6,
        )
        rng = np.random.default_rng(3)
        v = jnp.asarray(rng.normal(size=(3, 64)).astype(np.float32))
        p = np.asarray(_project_columns_to_simplex(v))
        assert np.all(p >= 0) and np.allclose(p.sum(axis=0), 1.0, atol=1e-5)
        # Brute force on a grid for one column.
        col = np.asarray(v[:, 0])
        g = np.linspace(0, 1, 201)
        best, best_d = None, np.inf
        for x in g:
            for y in g:
                z = 1 - x - y
                if z < 0:
                    continue
                d = (x - col[0]) ** 2 + (y - col[1]) ** 2 + (z - col[2]) ** 2
                if d < best_d:
                    best, best_d = (x, y, z), d
        np.testing.assert_allclose(p[:, 0], best, atol=1e-2)
