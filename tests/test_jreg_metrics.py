"""Tests: regressor semantics, Procrustes vs scipy, MPJPE/PA-MPJPE properties."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as ScipyRotation

from jrr_tpu.ops import jreg, procrustes
from jrr_tpu.evals import metrics


class TestJreg:
    def test_row_stochastic(self):
        rng = np.random.default_rng(0)
        j = jnp.asarray(rng.normal(size=(17, 100)).astype(np.float32))
        n = jreg.normalize_jreg(j)
        assert np.all(np.asarray(n) >= 0)
        np.testing.assert_allclose(np.asarray(n).sum(axis=1), 1.0, atol=1e-6)

    def test_apply_weighted_average(self):
        # A row-stochastic regressor maps identical vertices to that vertex.
        v = jnp.broadcast_to(jnp.asarray([1.0, 2.0, 3.0]), (2, 50, 3))
        j = jreg.normalize_jreg(jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (17, 50))))
        out = jreg.apply_jreg(j, v)
        np.testing.assert_allclose(out, np.broadcast_to([1.0, 2.0, 3.0], (2, 17, 3)), atol=1e-5)

    def test_reference_mask_is_all_ones(self):
        # Parity with the reference bug (scripts/utils.py:182-187).
        j = jnp.asarray([[0.0, 1.0], [2.0, 0.0]])
        np.testing.assert_array_equal(jreg.jreg_mask(j), np.ones((2, 2)))
        np.testing.assert_array_equal(jreg.jreg_mask(j, intended=True), [[0, 1], [1, 0]])

    def test_grad_flows_to_raw_regressor(self):
        # The intended training path: gradients reach the raw regressor through
        # mask/ReLU/normalize (the reference's silent no-op, done right;
        # SURVEY §2a "Known behavioral quirks").
        rng = np.random.default_rng(1)
        j_raw = jnp.asarray(np.abs(rng.normal(size=(17, 64))).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(4, 64, 3)).astype(np.float32))
        target = jnp.asarray(rng.normal(size=(4, 17, 3)).astype(np.float32))

        def loss(j):
            return jnp.mean((jreg.find_joints(j, v) - target) ** 2)

        g = jax.grad(loss)(j_raw)
        assert float(jnp.sum(jnp.abs(g))) > 0
        assert np.all(np.isfinite(np.asarray(g)))


class TestProcrustes:
    def test_recovers_exact_similarity(self):
        rng = np.random.default_rng(2)
        s1 = rng.normal(size=(8, 17, 3)).astype(np.float32)
        rots = ScipyRotation.random(8, random_state=3).as_matrix().astype(np.float32)
        scale = rng.uniform(0.5, 2.0, size=(8, 1, 1)).astype(np.float32)
        trans = rng.normal(size=(8, 1, 3)).astype(np.float32)
        s2 = scale * np.einsum("bij,bnj->bni", rots, s1) + trans

        s1_hat = procrustes.similarity_align(jnp.asarray(s1), jnp.asarray(s2))
        np.testing.assert_allclose(s1_hat, s2, atol=1e-4)

    def test_matches_scipy_orthogonal_procrustes_reduction(self):
        # Cross-check the rotation against scipy on centered, unit-scale data.
        from scipy.linalg import orthogonal_procrustes

        rng = np.random.default_rng(4)
        s1 = rng.normal(size=(17, 3))
        # Build s2 as a noisy proper rotation of s1 so the unconstrained scipy
        # optimum is a rotation (det=+1); the reference forces det=+1 while
        # scipy's orthogonal_procrustes allows reflections.
        rot = ScipyRotation.from_rotvec([0.4, -0.3, 0.7]).as_matrix()
        s2 = s1 @ rot.T * 1.3 + 0.05 * rng.normal(size=(17, 3))
        s1c = s1 - s1.mean(0)
        s2c = s2 - s2.mean(0)
        out = np.asarray(
            procrustes.similarity_align(jnp.asarray(s1c[None]), jnp.asarray(s2c[None]))
        )[0]
        r, _ = orthogonal_procrustes(s1c, s2c)
        scale = np.trace(r.T @ s1c.T @ s2c) / (s1c**2).sum()
        expected = scale * s1c @ r
        np.testing.assert_allclose(out, expected, atol=1e-4)

    def test_reflection_fixed(self):
        rng = np.random.default_rng(5)
        s1 = rng.normal(size=(4, 17, 3)).astype(np.float32)
        s2 = -s1  # a pure reflection cannot be matched by a rotation
        s1_hat = np.asarray(procrustes.similarity_align(jnp.asarray(s1), jnp.asarray(s2)))
        assert np.isfinite(s1_hat).all()


class TestMetrics:
    def test_zero_error(self):
        rng = np.random.default_rng(6)
        j_m = rng.normal(size=(5, 17, 3)).astype(np.float32)
        out = metrics.evaluate(jnp.asarray(j_m), jnp.asarray(j_m * 1000.0))
        assert float(out.mpjpe) < 1e-3
        assert float(out.pa_mpjpe) < 1e-2

    def test_translation_invariance(self):
        rng = np.random.default_rng(7)
        j_m = rng.normal(size=(5, 17, 3)).astype(np.float32)
        shifted = j_m + rng.normal(size=(5, 1, 3)).astype(np.float32)
        out = metrics.evaluate(jnp.asarray(shifted), jnp.asarray(j_m * 1000.0))
        assert float(out.mpjpe) < 1e-2

    def test_pa_le_mpjpe_under_rotation(self):
        rng = np.random.default_rng(8)
        j_m = rng.normal(size=(6, 17, 3)).astype(np.float32)
        rots = ScipyRotation.random(6, random_state=9).as_matrix().astype(np.float32)
        rotated = np.einsum("bij,bnj->bni", rots, j_m)
        out = metrics.evaluate(jnp.asarray(rotated), jnp.asarray(j_m * 1000.0))
        assert float(out.pa_mpjpe) < 1e-1
        assert float(out.pa_mpjpe) <= float(out.mpjpe) + 1e-6

    def test_known_offset(self):
        # One joint off by exactly 60mm (joint 0 kept aligned → pelvis centering no-op).
        j_m = np.zeros((1, 17, 3), dtype=np.float32)
        j_m[:, 1:] = np.linspace(0.1, 1.0, 16)[None, :, None]
        pred = j_m.copy()
        pred[0, 5, 0] += 0.060
        out = metrics.evaluate(jnp.asarray(pred), jnp.asarray(j_m * 1000.0))
        np.testing.assert_allclose(float(out.mpjpe), 60.0 / 17.0, atol=1e-3)

    def test_jittable(self):
        rng = np.random.default_rng(10)
        p = jnp.asarray(rng.normal(size=(3, 17, 3)).astype(np.float32))
        t = jnp.asarray(rng.normal(size=(3, 17, 3)).astype(np.float32) * 1000)
        f = jax.jit(metrics.evaluate)
        out = f(p, t)
        ref = metrics.evaluate(p, t)
        np.testing.assert_allclose(float(out.mpjpe), float(ref.mpjpe), rtol=1e-5)
