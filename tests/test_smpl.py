"""SMPL forward tests: independent numpy LBS oracle + structural properties.

The numpy oracle below re-derives linear blend skinning from the SMPL paper
definition using explicit 4x4 homogeneous transforms and per-vertex loops —
deliberately a different formulation from the fused batched implementation in
jrr_tpu/models/smpl.py — so agreement is a real cross-check (SURVEY §4 "golden
outputs" strategy, adapted since smplx is not installed here).
"""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as ScipyRotation

from jrr_tpu.models import smpl as smpl_mod
from jrr_tpu.ops import rotations as rot


def numpy_lbs_oracle(model, betas, rotmats):
    """Straightforward per-sample, 4x4-homogeneous LBS."""
    v_template = np.asarray(model.v_template, np.float64)
    shapedirs = np.asarray(model.shapedirs, np.float64)
    posedirs = np.asarray(model.posedirs, np.float64)
    j_reg = np.asarray(model.j_regressor, np.float64)
    weights = np.asarray(model.lbs_weights, np.float64)
    parents = model.parents
    B, J = rotmats.shape[:2]
    V = v_template.shape[0]

    all_verts, all_joints = [], []
    for b in range(B):
        v_shaped = v_template + shapedirs @ betas[b]
        j_rest = j_reg @ v_shaped
        pose_feat = (rotmats[b, 1:] - np.eye(3)).reshape(-1)
        v_posed = v_shaped + (pose_feat @ posedirs).reshape(V, 3)

        G = np.zeros((J, 4, 4))
        for k in range(J):
            local = np.eye(4)
            local[:3, :3] = rotmats[b, k]
            if parents[k] < 0:
                local[:3, 3] = j_rest[k]
                G[k] = local
            else:
                local[:3, 3] = j_rest[k] - j_rest[parents[k]]
                G[k] = G[parents[k]] @ local
        joints_posed = G[:, :3, 3].copy()
        # Remove rest-pose transform.
        A = G.copy()
        for k in range(J):
            A[k, :3, 3] -= A[k, :3, :3] @ j_rest[k]
        verts = np.zeros((V, 3))
        T = np.einsum("vj,jab->vab", weights, A)
        for v in range(V):
            verts[v] = T[v, :3, :3] @ v_posed[v] + T[v, :3, 3]
        all_verts.append(verts)
        all_joints.append(joints_posed)
    return np.stack(all_verts), np.stack(all_joints)


def _small_model():
    return smpl_mod.synthetic_smpl_model(seed=1, num_verts=96, num_faces=64)


def _random_pose(batch, seed=0, scale=0.3):
    rng = np.random.default_rng(seed)
    aa = rng.normal(scale=scale, size=(batch, 24, 3)).astype(np.float32)
    return ScipyRotation.from_rotvec(aa.reshape(-1, 3)).as_matrix().reshape(
        batch, 24, 3, 3
    ).astype(np.float32)


class TestForwardVsOracle:
    def test_matches_numpy_oracle(self):
        model = _small_model()
        B = 4
        rotmats = _random_pose(B, seed=2)
        betas = np.random.default_rng(3).normal(size=(B, 10)).astype(np.float32)

        out = smpl_mod.smpl_forward(
            model,
            jnp.asarray(betas),
            jnp.asarray(rotmats[:, :1]),
            jnp.asarray(rotmats[:, 1:]),
        )
        verts_ref, joints_ref = numpy_lbs_oracle(model, betas, rotmats)
        np.testing.assert_allclose(out.vertices, verts_ref, atol=2e-5)
        np.testing.assert_allclose(out.joints, joints_ref, atol=2e-5)

    def test_pose2rot_axis_angle_path(self):
        model = _small_model()
        B = 3
        rng = np.random.default_rng(4)
        aa = rng.normal(scale=0.3, size=(B, 24, 3)).astype(np.float32)
        rotmats = ScipyRotation.from_rotvec(aa.reshape(-1, 3)).as_matrix().reshape(
            B, 24, 3, 3
        ).astype(np.float32)
        betas = rng.normal(size=(B, 10)).astype(np.float32)

        out_aa = smpl_mod.smpl_forward(
            model,
            jnp.asarray(betas),
            jnp.asarray(aa[:, 0]),
            jnp.asarray(aa[:, 1:].reshape(B, -1)),
            pose2rot=True,
        )
        out_rm = smpl_mod.smpl_forward(
            model, jnp.asarray(betas), jnp.asarray(rotmats[:, :1]), jnp.asarray(rotmats[:, 1:])
        )
        np.testing.assert_allclose(out_aa.vertices, out_rm.vertices, atol=1e-5)


class TestStructure:
    def test_identity_pose_is_rest(self):
        model = _small_model()
        eye = jnp.broadcast_to(jnp.eye(3), (2, 24, 3, 3))
        betas = jnp.zeros((2, 10))
        out = smpl_mod.smpl_forward(model, betas, eye[:, :1], eye[:, 1:])
        np.testing.assert_allclose(out.vertices, np.broadcast_to(model.v_template, (2,) + model.v_template.shape), atol=1e-5)
        j_rest = np.asarray(model.j_regressor) @ np.asarray(model.v_template)
        np.testing.assert_allclose(out.joints, np.broadcast_to(j_rest, (2,) + j_rest.shape), atol=1e-5)

    def test_global_rotation_equivariance(self):
        # Rotating only the root rotates the whole mesh rigidly about the root joint.
        model = _small_model()
        betas = jnp.zeros((1, 10))
        eye = jnp.broadcast_to(jnp.eye(3), (1, 23, 3, 3))
        R = ScipyRotation.from_rotvec([0.3, -0.2, 0.8]).as_matrix().astype(np.float32)
        out_id = smpl_mod.smpl_forward(model, betas, jnp.eye(3)[None, None], eye)
        out_rot = smpl_mod.smpl_forward(model, betas, jnp.asarray(R)[None, None], eye)
        root = np.asarray(out_id.joints)[:, 0]
        expected = (np.asarray(out_id.vertices) - root[:, None]) @ R.T + root[:, None]
        np.testing.assert_allclose(out_rot.vertices, expected, atol=1e-5)

    def test_jit_vmap_grad(self):
        model = _small_model()
        B = 2
        rotmats = jnp.asarray(_random_pose(B, seed=5))
        betas = jnp.zeros((B, 10))

        @jax.jit
        def loss(betas, orient, pose):
            out = smpl_mod.smpl_forward(model, betas, orient, pose)
            return jnp.sum(out.vertices**2)

        g = jax.grad(loss)(betas, rotmats[:, :1], rotmats[:, 1:])
        assert np.all(np.isfinite(np.asarray(g)))

    def test_joints49_shape(self):
        model = smpl_mod.synthetic_smpl_model(seed=0)  # full-size has extra regressor
        B = 2
        rotmats = jnp.asarray(_random_pose(B, seed=6, scale=0.1))
        out = smpl_mod.smpl_forward(model, jnp.zeros((B, 10)), rotmats[:, :1], rotmats[:, 1:])
        j49 = smpl_mod.smpl_joints49(model, out)
        assert j49.shape == (B, 49, 3)

    def test_thin_appendages(self):
        """Thin-structure gate body (VERDICT r4 item 5): appendage vertices
        sit on finger-scale tubes (radius ~= the requested 0.01 m) protruding
        from the hand/foot tips, faces connect them (they rasterize), and the
        default model's geometry is untouched by the feature flag."""
        radius = 0.01
        model, aux = smpl_mod.synthetic_smpl_model(
            seed=0, thin_appendage_radius=radius, return_aux=True
        )
        av = aux["appendage_verts"]
        assert len(av) > 100
        base = smpl_mod.synthetic_smpl_model(seed=0)
        keep = ~np.isin(np.arange(model.num_verts), av)
        np.testing.assert_array_equal(
            np.asarray(model.v_template)[keep], np.asarray(base.v_template)[keep]
        )
        # Faces reach the appendages, so they show up in a silhouette.
        f = np.asarray(model.faces)
        assert np.isin(f, av).any(axis=1).sum() > 100
        # Tube geometry per tip: spread perpendicular to the principal axis
        # is the requested radius (thin), extent along it is the 0.18 m
        # appendage length.
        v = np.asarray(model.v_template)
        assert len(aux["appendage_groups"]) == 4
        for g in aux["appendage_groups"]:
            pts = v[g] - v[g].mean(axis=0)
            _, _, vt = np.linalg.svd(pts, full_matrices=False)
            perp = pts - np.outer(pts @ vt[0], vt[0])
            r = np.linalg.norm(perp, axis=1)
            assert np.percentile(r, 90) < 2.0 * radius, np.percentile(r, 90)
            assert np.ptp(pts @ vt[0]) > 0.15  # appendage length
