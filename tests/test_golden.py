"""Golden regression: the refinement numerics are pinned across changes.

If this fails after an INTENTIONAL behavior change, regenerate with
`python tests/make_golden.py` and say so in the commit message.
"""

import os

import numpy as np

import make_golden


def test_refinement_matches_golden():
    golden_path = os.path.join(os.path.dirname(__file__), "golden_refinement.npz")
    out = make_golden.run()
    with np.load(golden_path) as f:
        for key in ("pose6d", "orient6d", "betas", "cam_t", "joints3d"):
            np.testing.assert_allclose(out[key], f[key], atol=5e-4, err_msg=key)
        np.testing.assert_allclose(
            out["stage_b_total"], f["stage_b_total"], atol=1e-4, err_msg="loss curve"
        )
