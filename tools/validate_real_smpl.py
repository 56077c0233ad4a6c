"""Validate conversion of a REAL SMPL pickle against the float64 torch oracle.

Usage:
  python tools/validate_real_smpl.py /path/to/basicmodel_neutral_lbs_*.pkl \
      [--extra /path/to/J_regressor_extra.npy] [--out smpl_neutral.npz]

Runs `convert_smpl_pickle` → `load_smpl_npz` → `smpl_forward` on random poses
and reports the max |Δ| vs `tests/torch_lbs_replay.py` (float64, smplx
semantics). Pass/fail bar: 1e-5 m (VERDICT task 4). The test-suite twin of
this script (tests/test_smpl_golden.py) runs the identical check on a
synthetic model stored in the real pickle layout.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("pkl")
    ap.add_argument("--extra", default=None, help="J_regressor_extra.npy (for 49-joint check)")
    ap.add_argument("--out", default="/tmp/smpl_converted.npz")
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    import torch
    import jax.numpy as jnp

    from jrr_tpu.models import smpl as smpl_mod
    from tests import torch_lbs_replay as replay

    smpl_mod.convert_smpl_pickle(args.pkl, args.out)
    model = smpl_mod.load_smpl_npz(args.out, j_regressor_extra_path=args.extra)

    with open(args.pkl, "rb") as f:
        raw = smpl_mod._ChumpyUnpickler(f, encoding="latin1").load()
    dense = smpl_mod._to_dense
    parents = np.asarray(raw["kintree_table"])[0].astype(np.int64)
    parents[0] = -1

    rng = np.random.default_rng(0)
    nb = model.num_betas
    betas = rng.normal(scale=1.0, size=(args.batch, nb))
    pose_aa = rng.normal(scale=0.3, size=(args.batch, 24, 3))

    rots = replay.rodrigues(torch.from_numpy(pose_aa)).numpy()
    out = smpl_mod.smpl_forward(
        model,
        jnp.asarray(betas, jnp.float32),
        jnp.asarray(rots[:, :1], jnp.float32),
        jnp.asarray(rots[:, 1:], jnp.float32),
    )
    verts64, joints64 = replay.lbs_replay(
        torch.from_numpy(betas),
        torch.from_numpy(rots),
        torch.from_numpy(dense(raw["v_template"]).astype(np.float64)),
        torch.from_numpy(dense(raw["shapedirs"]).astype(np.float64)[..., :nb]),
        torch.from_numpy(dense(raw["posedirs"]).astype(np.float64)),
        torch.from_numpy(dense(raw["J_regressor"]).astype(np.float64)),
        parents,
        torch.from_numpy(dense(raw["weights"]).astype(np.float64)),
        pose2rot=False,
    )
    dv = float(np.abs(np.asarray(out.vertices) - verts64.numpy()).max())
    dj = float(np.abs(np.asarray(out.joints) - joints64.numpy()).max())
    print(f"max |dVerts| = {dv:.3e} m    max |dJoints| = {dj:.3e} m")

    ok = dv < 1e-5 and dj < 1e-5
    if args.extra is not None:
        j49 = smpl_mod.smpl_joints49(model, out)
        want = replay.spin49_replay(
            verts64, joints64,
            torch.from_numpy(np.load(args.extra).astype(np.float64)),
        )
        d49 = float(np.abs(np.asarray(j49) - want.numpy()).max())
        print(f"max |dJoints49| = {d49:.3e} m")
        ok = ok and d49 < 1e-5
    print("PASS" if ok else "FAIL", "(bar: 1e-5 m)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
