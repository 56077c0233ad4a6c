"""Unit tests for rotation conversions (SURVEY §4: round-trips vs closed forms)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as ScipyRotation

from jrr_tpu.ops import rotations as rot


def _random_rotmats(n=64, seed=0):
    return ScipyRotation.random(n, random_state=seed).as_matrix().astype(np.float32)


class TestRot6d:
    def test_valid_rotation(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (32, 6))
        r = rot.rot6d_to_rotmat(x)
        eye = jnp.einsum("bij,bkj->bik", r, r)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(r)), 1.0, atol=1e-5)

    def test_roundtrip_from_rotmat(self):
        r0 = _random_rotmats()
        r1 = rot.rot6d_to_rotmat(rot.rotmat_to_rot6d(jnp.asarray(r0)))
        np.testing.assert_allclose(r1, r0, atol=1e-5)

    def test_identity_layout(self):
        # The 6D vector (1,0,0,1,0,0) reads as columns (1,0,0) and (0,1,0)
        # under the reference layout (scripts/utils.py:198-200) → identity.
        x = jnp.array([1.0, 0.0, 0.0, 1.0, 0.0, 0.0])
        np.testing.assert_allclose(rot.rot6d_to_rotmat(x), np.eye(3), atol=1e-6)

    def test_matches_torch_reference_semantics(self):
        # Independent torch re-derivation of the reference Gram-Schmidt
        # (scripts/utils.py:190-204) to pin the layout.
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        x_np = np.random.default_rng(1).normal(size=(16, 6)).astype(np.float32)
        xt = torch.from_numpy(x_np).view(-1, 3, 2)
        a1, a2 = xt[:, :, 0], xt[:, :, 1]
        b1 = F.normalize(a1)
        b2 = F.normalize(a2 - torch.einsum("bi,bi->b", b1, a2).unsqueeze(-1) * b1)
        b3 = torch.cross(b1, b2, dim=-1)
        expected = torch.stack((b1, b2, b3), dim=-1).numpy()
        got = rot.rot6d_to_rotmat(jnp.asarray(x_np))
        np.testing.assert_allclose(got, expected, atol=1e-5)


class TestQuatAxisAngle:
    def test_quat_rotmat_roundtrip(self):
        r0 = _random_rotmats()
        q = rot.rotmat_to_quat(jnp.asarray(r0))
        r1 = rot.quat_to_rotmat(q)
        np.testing.assert_allclose(r1, r0, atol=1e-5)

    def test_quat_vs_scipy(self):
        r0 = _random_rotmats()
        q = np.asarray(rot.rotmat_to_quat(jnp.asarray(r0)))  # (w,x,y,z)
        q_scipy = ScipyRotation.from_matrix(r0).as_quat()  # (x,y,z,w)
        q_scipy = np.concatenate([q_scipy[:, 3:], q_scipy[:, :3]], axis=1)
        q_scipy *= np.where(q_scipy[:, :1] < 0, -1.0, 1.0)
        np.testing.assert_allclose(np.abs(q), np.abs(q_scipy), atol=1e-5)

    def test_axis_angle_roundtrip(self):
        aa0 = np.random.default_rng(2).normal(size=(64, 3)).astype(np.float32)
        r = rot.axis_angle_to_rotmat(jnp.asarray(aa0))
        r_scipy = ScipyRotation.from_rotvec(aa0).as_matrix()
        np.testing.assert_allclose(r, r_scipy, atol=1e-5)
        aa1 = rot.rotmat_to_axis_angle(r)
        r2 = ScipyRotation.from_rotvec(np.asarray(aa1)).as_matrix()
        np.testing.assert_allclose(r2, r_scipy, atol=1e-4)

    def test_zero_angle_safe(self):
        aa = jnp.zeros((4, 3))
        np.testing.assert_allclose(
            rot.axis_angle_to_rotmat(aa), np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-6
        )
        # Gradients must be finite at θ=0.
        g = jax.grad(lambda a: jnp.sum(rot.axis_angle_to_rotmat(a)))(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_rotmat_axis_angle_roundtrip_near_pi(self):
        axis = np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]], dtype=np.float32)
        aa0 = axis * (np.pi - 1e-3)
        r0 = ScipyRotation.from_rotvec(aa0).as_matrix().astype(np.float32)
        aa1 = rot.rotmat_to_axis_angle(jnp.asarray(r0))
        r1 = ScipyRotation.from_rotvec(np.asarray(aa1)).as_matrix()
        np.testing.assert_allclose(r1, r0, atol=1e-4)


def test_jit_and_vmap():
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 24, 6))
    f = jax.jit(jax.vmap(rot.rot6d_to_rotmat))
    out = f(x)
    assert out.shape == (8, 24, 3, 3)
    np.testing.assert_allclose(out, rot.rot6d_to_rotmat(x), atol=1e-6)
