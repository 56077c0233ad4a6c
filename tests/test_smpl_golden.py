"""SMPL golden parity vs a float64 torch LBS replay of smplx semantics.

VERDICT task 4: validates the WHOLE real-weight path — `convert_smpl_pickle`
on a pickle with the official storage conventions (chumpy-wrapped float64
arrays, scipy-CSC J_regressor, posedirs stored (V, 3, 207), kintree_table with
a 2³²−1 root sentinel) → `load_smpl_npz` (incl. the posedirs storage-order
reshape, models/smpl.py:323-324) → `smpl_forward` (both pose2rot paths) →
`smpl_joints49` — against `tests/torch_lbs_replay.py` running in float64 on
the original arrays. Tolerance 1e-5 m, the VERDICT's bar. The same replay is
what `tools/validate_real_smpl.py` runs against a real `basicmodel_*.pkl`.
"""

import pickle
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
scipy_sparse = pytest.importorskip("scipy.sparse")

import jax.numpy as jnp

from jrr_tpu.models import smpl as smpl_mod
from tests import torch_lbs_replay as replay

V, J, NB = 6890, 24, 10
B = 3


def _register_fake_chumpy():
    chumpy = types.ModuleType("chumpy")

    class Ch:
        def __init__(self, x):
            self.x = np.asarray(x)

    Ch.__module__ = "chumpy"
    Ch.__qualname__ = "Ch"
    chumpy.Ch = Ch
    sys.modules["chumpy"] = chumpy
    return Ch


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    """Synthetic full-size model saved in the REAL smplx pickle layout, then
    run through the converter; plus the raw float64 arrays for the oracle."""
    tmp = tmp_path_factory.mktemp("smpl_golden")
    rng = np.random.default_rng(42)

    # Plausible body geometry from the synthetic generator, stored the way the
    # official pickle stores it (float64, smplx axis order).
    syn = smpl_mod.synthetic_smpl_model(seed=3, num_verts=V)
    raw = dict(
        v_template=np.asarray(syn.v_template, np.float64),
        shapedirs=np.asarray(syn.shapedirs, np.float64),  # (V, 3, 10)
        # jrr stores posedirs (207, V*3); the pickle stores (V, 3, 207).
        posedirs=np.asarray(syn.posedirs, np.float64).T.reshape(V, 3, 9 * (J - 1)),
        j_regressor=np.asarray(syn.j_regressor, np.float64),
        weights=np.asarray(syn.lbs_weights, np.float64),
        faces=np.asarray(syn.faces, np.int64),
        parents=np.asarray(smpl_mod.SMPL_PARENTS, np.int64),
        j_regressor_extra=np.abs(rng.normal(size=(9, V))).astype(np.float64),
    )
    raw["j_regressor_extra"] /= raw["j_regressor_extra"].sum(axis=1, keepdims=True)

    Ch = _register_fake_chumpy()
    kintree = np.vstack(
        [np.where(raw["parents"] < 0, 2**32 - 1, raw["parents"]), np.arange(J)]
    )
    pkl_payload = {
        "v_template": Ch(raw["v_template"]),
        "shapedirs": Ch(raw["shapedirs"]),
        "posedirs": Ch(raw["posedirs"]),
        "J_regressor": scipy_sparse.csc_matrix(raw["j_regressor"]),
        "weights": Ch(raw["weights"]),
        "f": raw["faces"],
        "kintree_table": kintree,
    }
    pkl = str(tmp / "basicmodel_neutral.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(pkl_payload, f)

    extra_npy = str(tmp / "J_regressor_extra.npy")
    np.save(extra_npy, raw["j_regressor_extra"].astype(np.float32))

    npz = str(tmp / "smpl_neutral.npz")
    smpl_mod.convert_smpl_pickle(pkl, npz)
    model = smpl_mod.load_smpl_npz(npz, j_regressor_extra_path=extra_npy)

    betas = rng.normal(scale=1.0, size=(B, NB)).astype(np.float64)
    pose_aa = rng.normal(scale=0.3, size=(B, J, 3)).astype(np.float64)
    pose_aa[0, 5] = 0.0  # exercise the zero-rotation Rodrigues branch
    return model, raw, betas, pose_aa


def _replay_forward(raw, betas, pose, pose2rot):
    return replay.lbs_replay(
        torch.from_numpy(betas),
        torch.from_numpy(pose),
        torch.from_numpy(raw["v_template"]),
        torch.from_numpy(raw["shapedirs"]),
        torch.from_numpy(raw["posedirs"]),
        torch.from_numpy(raw["j_regressor"]),
        np.asarray(raw["parents"]),
        torch.from_numpy(raw["weights"]),
        pose2rot=pose2rot,
    )


def test_rotmat_path_matches_float64_replay(golden):
    model, raw, betas, pose_aa = golden
    rots = replay.rodrigues(torch.from_numpy(pose_aa)).numpy()
    out = smpl_mod.smpl_forward(
        model,
        jnp.asarray(betas, jnp.float32),
        jnp.asarray(rots[:, :1], jnp.float32),
        jnp.asarray(rots[:, 1:], jnp.float32),
    )
    verts64, joints64 = _replay_forward(raw, betas, torch.from_numpy(rots).numpy(), False)
    assert np.abs(np.asarray(out.vertices) - verts64.numpy()).max() < 1e-5
    assert np.abs(np.asarray(out.joints) - joints64.numpy()).max() < 1e-5


def test_pose2rot_path_matches_float64_replay(golden):
    model, raw, betas, pose_aa = golden
    out = smpl_mod.smpl_forward(
        model,
        jnp.asarray(betas, jnp.float32),
        jnp.asarray(pose_aa[:, 0], jnp.float32),
        jnp.asarray(pose_aa[:, 1:].reshape(B, -1), jnp.float32),
        pose2rot=True,
    )
    verts64, joints64 = _replay_forward(raw, betas, pose_aa.reshape(B, -1), True)
    assert np.abs(np.asarray(out.vertices) - verts64.numpy()).max() < 1e-5
    assert np.abs(np.asarray(out.joints) - joints64.numpy()).max() < 1e-5


def test_joints49_gather_matches_replay(golden):
    model, raw, betas, pose_aa = golden
    rots = replay.rodrigues(torch.from_numpy(pose_aa)).numpy()
    out = smpl_mod.smpl_forward(
        model,
        jnp.asarray(betas, jnp.float32),
        jnp.asarray(rots[:, :1], jnp.float32),
        jnp.asarray(rots[:, 1:], jnp.float32),
    )
    j49 = smpl_mod.smpl_joints49(model, out)
    verts64, joints64 = _replay_forward(raw, betas, rots, False)
    want = replay.spin49_replay(
        verts64, joints64, torch.from_numpy(raw["j_regressor_extra"])
    )
    assert j49.shape == (B, 49, 3)
    assert np.abs(np.asarray(j49) - want.numpy()).max() < 1e-5


def test_posedirs_storage_order_is_loaded_correctly(golden):
    """A transposed-basis load would still produce the right SHAPE — this
    asserts the VALUES: pose offsets for a single-joint bend must match."""
    model, raw, betas, _ = golden
    aa = np.zeros((1, J, 3))
    aa[0, 1] = (0.7, -0.2, 0.4)  # bend one joint only
    rots = replay.rodrigues(torch.from_numpy(aa)).numpy()
    out = smpl_mod.smpl_forward(
        model,
        jnp.zeros((1, NB), jnp.float32),
        jnp.asarray(rots[:, :1], jnp.float32),
        jnp.asarray(rots[:, 1:], jnp.float32),
    )
    verts64, _ = _replay_forward(raw, np.zeros((1, NB)), rots, False)
    assert np.abs(np.asarray(out.vertices) - verts64.numpy()).max() < 1e-5
