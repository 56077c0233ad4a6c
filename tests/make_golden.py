"""Regenerate the golden refinement fixture (run from repo root on CPU):

    python tests/make_golden.py

Captures a small deterministic refinement problem and its outputs so future
changes that alter numerics are caught (SURVEY §4 golden-file strategy).
Regenerate ONLY for intentional behavior changes, and say so in the commit.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_problem():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from jrr_tpu.config import RefinerConfig, SilhouetteConfig
    from jrr_tpu.models import smpl as smpl_mod
    from jrr_tpu.ops import jreg as jreg_lib, rotations
    from jrr_tpu.refine import engine, losses
    from jrr_tpu.render import silhouette as S

    model = smpl_mod.synthetic_smpl_model(seed=11, num_verts=96, num_faces=160)
    rng = np.random.default_rng(11)
    j_reg = np.zeros((17, 96), np.float32)
    for j in range(17):
        j_reg[j, rng.choice(96, 6, replace=False)] = rng.uniform(0.5, 1.0, 6)
    j_reg = jnp.asarray(j_reg)
    B = 2
    gt = losses.FrameParams(
        pose6d=rotations.rotmat_to_rot6d(rotations.random_rotmat(jax.random.PRNGKey(11), (B, 23))),
        orient6d=rotations.rotmat_to_rot6d(rotations.random_rotmat(jax.random.PRNGKey(12), (B, 1))),
        betas=jnp.asarray(rng.normal(scale=0.4, size=(B, 10)).astype(np.float32)),
        cam_t=jnp.asarray(
            np.stack([rng.uniform(-0.1, 0.1, B), rng.uniform(-0.1, 0.1, B),
                      rng.uniform(25, 30, B)], axis=-1).astype(np.float32)
        ),
    )
    cfg = dataclasses.replace(
        RefinerConfig(), stage_a_steps=20, stage_b_steps=20,
        use_discriminators=False,
        silhouette=SilhouetteConfig(
            image_size=32, tile_size=8, faces_per_tile=96, sigma=5e-3,
            blur_radius=0.05, rebin_interval=5, bin_margin_px=4.0,
        ),
    )
    out = losses.forward_frame(model, gt)
    joints = jreg_lib.apply_jreg(jreg_lib.normalize_jreg(j_reg), out.vertices)
    spec = losses.rasterizer_spec(cfg)
    mask = S.render_mesh_silhouette(out.vertices, model.faces, gt.cam_t, spec)
    data = losses.FrameBatch(
        gt_j2d=losses.reproject_joints(joints, gt.cam_t, cfg),
        gt_j3d=joints * 1000.0, mask=mask,
    )
    init = losses.FrameParams(
        pose6d=gt.pose6d + 0.04, orient6d=gt.orient6d + 0.02,
        betas=gt.betas + 0.05, cam_t=gt.cam_t + 0.04,
    )
    return model, j_reg, cfg, init, data, engine


def run():
    import jax

    jax.config.update("jax_platforms", "cpu")
    model, j_reg, cfg, init, data, engine = build_problem()
    res = engine.refine_batch(model, j_reg, init, data, cfg)
    return {
        "pose6d": np.asarray(res.params.pose6d),
        "orient6d": np.asarray(res.params.orient6d),
        "betas": np.asarray(res.params.betas),
        "cam_t": np.asarray(res.params.cam_t),
        "joints3d": np.asarray(res.joints3d),
        "stage_b_total": np.asarray(res.stage_b_terms.total),
    }


if __name__ == "__main__":
    out = run()
    path = os.path.join(os.path.dirname(__file__), "golden_refinement.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: total[0]={out['stage_b_total'][0]:.6f} "
          f"total[-1]={out['stage_b_total'][-1]:.6f}")
