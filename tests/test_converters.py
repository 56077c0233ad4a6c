"""One-time converter paths: reference torch .pt dataset layout and the
chumpy-pickled SMPL model."""

import os
import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from jrr_tpu.data import h36m
from jrr_tpu.models import smpl as smpl_mod


def test_convert_precomputed_pt_roundtrip(tmp_path):
    # Build a reference-layout split dir of torch tensors + path pickles
    # (reference: scripts/data.py:50-69).
    src = tmp_path / "precomputed_val_src"
    os.makedirs(src)
    n = 3
    rng = np.random.default_rng(0)
    ref = {}
    for key, shape in [
        ("bboxes", (n, 4)), ("betas", (n, 10)), ("estimated_translation", (n, 3)),
        ("gt_j2d", (n, 17, 2)), ("gt_j3d", (n, 17, 3)), ("intrinsics", (n, 3, 3)),
        ("orient", (n, 1, 6)), ("pose", (n, 23, 6)),
    ]:
        ref[key] = rng.normal(size=shape).astype(np.float32)
        torch.save(torch.from_numpy(ref[key]), src / f"{key}.pt")
    paths = [f"/data/S9/x/imageSequence/54/img_{i:06d}.jpg" for i in range(n)]
    with open(src / "images.pkl", "wb") as f:
        pickle.dump(paths, f)
    with open(src / "pixel_annotations.pkl", "wb") as f:
        pickle.dump(paths, f)

    dst = tmp_path / "root" / "precomputed_val"
    h36m.convert_precomputed_pt(str(src), str(dst))

    ds = h36m.H36MDataset(str(tmp_path / "root"), "validation")
    assert len(ds) == n
    np.testing.assert_allclose(ds.tensors["gt_j3d"], ref["gt_j3d"])
    assert ds.images == paths


def test_convert_smpl_pickle(tmp_path):
    # Fake chumpy-style SMPL pickle: chumpy arrays pickle as objects whose
    # state dict carries the ndarray under 'x'; J_regressor is scipy CSC.
    import sys
    import types

    import scipy.sparse

    # Register a throwaway "chumpy" module so the pickle stream carries real
    # chumpy.Ch GLOBAL records, exercising the unpickler's find_class hook.
    chumpy = types.ModuleType("chumpy")

    class FakeCh:
        def __init__(self, x):
            self.x = x

    FakeCh.__module__ = "chumpy"
    FakeCh.__qualname__ = "Ch"
    chumpy.Ch = FakeCh
    sys.modules["chumpy"] = chumpy

    V, J = 24, 4
    rng = np.random.default_rng(1)
    data = {
        "v_template": FakeCh(rng.normal(size=(V, 3))),
        "shapedirs": FakeCh(rng.normal(size=(V, 3, 10))),
        "posedirs": FakeCh(rng.normal(size=(V, 3, 9 * (J - 1)))),
        "J_regressor": scipy.sparse.csc_matrix(np.abs(rng.normal(size=(J, V)))),
        "weights": FakeCh(np.abs(rng.normal(size=(V, J)))),
        "f": np.zeros((10, 3), np.int64),
        "kintree_table": np.vstack([[2**32 - 1, 0, 0, 1], np.arange(4)]),
    }
    pkl = str(tmp_path / "smpl.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(data, f)
    del sys.modules["chumpy"]  # loading must not need chumpy installed

    npz = str(tmp_path / "smpl.npz")
    smpl_mod.convert_smpl_pickle(pkl, npz)
    model = smpl_mod.load_smpl_npz(npz, num_betas=10)
    assert model.v_template.shape == (V, 3)
    assert model.j_regressor.shape == (J, V)
    assert model.posedirs.shape == (9 * (J - 1), V * 3)
    assert model.parents[0] == -1
