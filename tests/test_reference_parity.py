"""Golden parity against the REFERENCE'S OWN runnable torch code.

Unlike the other parity tests (which validate against independent
re-derivations), these import `/root/reference/scripts/*` directly (pure
torch, CPU) and assert jrr_tpu equality on the same random inputs:

- rot6d_to_rotmat            (reference: scripts/utils.py:190-204)
- batch_compute_similarity_transform_torch (scripts/eval_utils.py:7-58)
- evaluate (MPJPE/PA-MPJPE)  (scripts/utils.py:117-145)
- find_joints normalization  (scripts/utils.py:85-103)
- find_j_reg_mask quirk      (scripts/utils.py:182-187)
- move_pelvis                (scripts/utils.py:106-114)
- vec2mat_for_similarity     (scripts/perturbation_helper.py:185-210)
- crop_intrinsics / resize_intrinsics (scripts/data.py:385-449)
- find_crop end-to-end       (scripts/data.py:220-271)
- linearized.grid_sample bilinear (scripts/linearized.py:88-97)

The reference is studied/executed, never copied: these tests call it as an
oracle only. If it is not mounted, the module skips (CI stays hermetic).
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "scripts")), reason="reference repo not mounted"
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref():
    """Import the reference's scripts package with its import-time argparse
    tamed (scripts/args.py:100 parses sys.argv at import)."""
    argv, path = sys.argv, list(sys.path)
    sys.argv = ["parity", "--device", "cpu"]
    sys.path.insert(0, REF)
    # The reference expects to be imported as the `scripts` package.
    for mod in [m for m in sys.modules if m == "scripts" or m.startswith("scripts.")]:
        del sys.modules[mod]
    try:
        import scripts.utils as r_utils
        import scripts.eval_utils as r_eval_utils
        import scripts.data as r_data
        import scripts.perturbation_helper as r_pert
        import scripts.sampling_helper as r_sampling
        import scripts.linearized as r_linearized

        yield types.SimpleNamespace(
            utils=r_utils,
            eval_utils=r_eval_utils,
            data=r_data,
            pert=r_pert,
            sampling=r_sampling,
            linearized=r_linearized,
        )
    finally:
        sys.argv, sys.path = argv, path
        for mod in [m for m in sys.modules if m == "scripts" or m.startswith("scripts.")]:
            del sys.modules[mod]


def t2n(x):
    return x.detach().cpu().numpy()


def test_rot6d_parity(ref, rng):
    from jrr_tpu.ops import rotations

    x = rng.normal(size=(64, 6)).astype(np.float32)
    want = t2n(ref.utils.rot6d_to_rotmat(torch.from_numpy(x)))
    got = np.asarray(rotations.rot6d_to_rotmat(x))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_procrustes_parity(ref, rng):
    from jrr_tpu.ops import procrustes

    s1 = rng.normal(size=(8, 17, 3)).astype(np.float32)
    s2 = (1.7 * s1 + rng.normal(scale=0.05, size=s1.shape) + 0.3).astype(np.float32)
    want = t2n(
        ref.eval_utils.batch_compute_similarity_transform_torch(
            torch.from_numpy(s1), torch.from_numpy(s2)
        )
    )
    got = np.asarray(procrustes.similarity_align(s1, s2))
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_evaluate_parity(ref, rng):
    from jrr_tpu.evals import metrics

    pred = rng.normal(scale=0.3, size=(8, 17, 3)).astype(np.float32)
    gt_mm = (pred * 1000.0 + rng.normal(scale=30.0, size=pred.shape)).astype(np.float32)
    want_mpjpe, want_pa = ref.utils.evaluate(
        torch.from_numpy(pred.copy()), torch.from_numpy(gt_mm.copy())
    )
    got = metrics.evaluate(pred, gt_mm)
    np.testing.assert_allclose(float(got.mpjpe), want_mpjpe, rtol=1e-4)
    np.testing.assert_allclose(float(got.pa_mpjpe), want_pa, rtol=1e-4)


def test_find_joints_normalization_parity(ref, rng):
    """The masked→ReLU→row-norm regressor application, with the reference's
    own smpl call stubbed to return fixed vertices (semantics under test are
    the regressor normalization + matmul, scripts/utils.py:87-98)."""
    from jrr_tpu.ops import jreg

    verts = rng.normal(size=(4, 50, 3)).astype(np.float32)
    j_reg = rng.normal(size=(17, 50)).astype(np.float32)  # includes negatives
    j_reg[:, ::7] = 0.0
    mask = t2n(ref.utils.find_j_reg_mask(torch.from_numpy(j_reg)))

    out = types.SimpleNamespace(vertices=torch.from_numpy(verts))
    fake_smpl = lambda **kw: out
    want = t2n(
        ref.utils.find_joints(
            fake_smpl, None, None, None,
            torch.from_numpy(j_reg), mask=torch.from_numpy(mask),
        )
    )
    got = np.asarray(
        jreg.find_joints(j_reg, verts, mask=jreg.jreg_mask(j_reg, intended=False))
    )
    np.testing.assert_allclose(got, want, atol=2e-6)
    # the reference mask is all-ones (quirk preserved by intended=False)
    assert (mask == 1.0).all()


def test_move_pelvis_parity(ref, rng):
    from jrr_tpu.ops import jreg

    j = rng.normal(size=(6, 17, 3)).astype(np.float32)
    want = t2n(ref.utils.move_pelvis(torch.from_numpy(j)))
    got = np.asarray(jreg.move_pelvis(j))
    np.testing.assert_allclose(got, want, atol=0)


def test_similarity_vec2mat_parity(ref, rng):
    from jrr_tpu.data import crop

    vec = rng.normal(size=(16, 5)).astype(np.float32)
    want = t2n(ref.pert.vec2mat_for_similarity(torch.from_numpy(vec)))
    got = np.asarray(crop.similarity_vec_to_mat(vec))
    np.testing.assert_allclose(got, want, atol=1e-6)


def _random_intrinsics(rng, b):
    intr = np.zeros((b, 3, 3), np.float32)
    intr[:, 0, 0] = rng.uniform(900, 1200, b)
    intr[:, 1, 1] = rng.uniform(900, 1200, b)
    intr[:, 0, 2] = rng.uniform(450, 550, b)
    intr[:, 1, 2] = rng.uniform(450, 550, b)
    intr[:, 2, 2] = 1.0
    return intr


def test_crop_resize_intrinsics_parity(ref, rng):
    from jrr_tpu.data import crop

    b = 8
    intr = _random_intrinsics(rng, b)
    h = rng.uniform(300, 600, b).astype(np.float32)
    w = rng.uniform(300, 600, b).astype(np.float32)
    ci = rng.uniform(300, 700, b).astype(np.float32)
    cj = rng.uniform(300, 700, b).astype(np.float32)
    want = t2n(
        ref.data.crop_intrinsics(
            torch.from_numpy(intr.copy()), torch.from_numpy(h), torch.from_numpy(w),
            torch.from_numpy(ci), torch.from_numpy(cj),
        )
    )
    got = np.asarray(crop.crop_intrinsics(intr, h, w, ci, cj))
    np.testing.assert_allclose(got, want, atol=1e-4)

    s = rng.uniform(0.3, 0.8, b).astype(np.float32)
    want = t2n(
        ref.data.resize_intrinsics(
            torch.from_numpy(intr.copy()), torch.from_numpy(h), torch.from_numpy(w),
            torch.from_numpy(s),
        )
    )
    got = np.asarray(crop.resize_intrinsics(intr, h, w, s))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-3)


def test_find_crop_parity(ref, rng):
    """End-to-end crop: warped image + crop bookkeeping + updated intrinsics
    (reference: scripts/data.py:220-271)."""
    from jrr_tpu.data import crop

    b, res = 2, 64
    image = rng.uniform(size=(b, 3, 1000, 1000)).astype(np.float32)
    # bbox layout per scripts/data.py:223-226: (min_y, min_x, max_y, max_x)
    bbox = np.stack(
        [
            rng.uniform(200, 320, b), rng.uniform(250, 350, b),
            rng.uniform(600, 720, b), rng.uniform(620, 750, b),
        ],
        axis=1,
    ).astype(np.float32)
    intr = _random_intrinsics(rng, b)

    want_img, want_min_x, want_min_y, want_scale, want_intr = ref.data.find_crop(
        torch.from_numpy(image), torch.from_numpy(bbox),
        torch.from_numpy(intr.copy()), img_size=res,
    )
    got = crop.find_crop(image, bbox, intr, img_size=res)
    np.testing.assert_allclose(np.asarray(got.scale), t2n(want_scale), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got.min_x), t2n(want_min_x), atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.min_y), t2n(want_min_y), atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.intrinsics), t2n(want_intr), rtol=2e-5, atol=2e-3)
    # Image atol: f32 grid coords at the 1000-px scale carry ~1e-4 ulp noise
    # through the bilinear weights; identical math would still differ by this.
    np.testing.assert_allclose(np.asarray(got.image), t2n(want_img), atol=3e-4)


def test_grid_sample_bilinear_parity(ref, rng):
    from jrr_tpu.ops import sampling

    image = rng.uniform(size=(2, 3, 37, 41)).astype(np.float32)
    grid = rng.uniform(-1.2, 1.2, size=(2, 19, 23, 2)).astype(np.float32)
    want = t2n(
        ref.linearized.grid_sample(
            torch.from_numpy(image), torch.from_numpy(grid),
            mode="bilinear", padding_mode="zeros",
        )
    )
    got = np.asarray(sampling.grid_sample(image, grid, mode="bilinear"))
    np.testing.assert_allclose(got, want, atol=2e-6)
