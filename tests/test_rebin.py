"""Binning amortization: reused candidate lists match per-step binning."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from jrr_tpu.config import CameraConfig, RefinerConfig, SilhouetteConfig
from jrr_tpu.models import smpl as smpl_mod
from jrr_tpu.ops import jreg as jreg_lib, rotations
from jrr_tpu.render import silhouette as S
from jrr_tpu.refine import engine, losses


def test_bins_reuse_matches_fresh_render():
    # Render with bins computed at slightly different vertices: within the
    # margin the result must match the freshly-binned render.
    model = smpl_mod.synthetic_smpl_model(seed=1, num_verts=96, num_faces=160)
    verts = model.v_template[None]
    cam_t = jnp.asarray([[0.0, 0.1, 28.0]])
    spec = S.RasterizerSpec(
        image_size=32, tile_size=8, faces_per_tile=96, sigma=1e-3,
        blur_radius=0.005, backend="pallas", bin_margin_px=4.0,
    )
    fresh = S.render_mesh_silhouette(verts, model.faces, cam_t, spec)
    # bins computed at perturbed vertices (sub-margin drift in screen space)
    bins = S.compute_bins(verts + 0.02, model.faces, cam_t, spec)
    reused = S.render_mesh_silhouette(verts, model.faces, cam_t, spec, bins=bins)
    np.testing.assert_allclose(np.asarray(reused), np.asarray(fresh), atol=1e-5)


def _problem(batch=2, seed=0):
    model = smpl_mod.synthetic_smpl_model(seed=seed, num_verts=96, num_faces=160)
    rng = np.random.default_rng(seed)
    j_reg = np.zeros((17, 96), np.float32)
    for j in range(17):
        j_reg[j, rng.choice(96, 6, replace=False)] = rng.uniform(0.5, 1.0, 6)
    j_reg = jnp.asarray(j_reg)
    gt = losses.FrameParams(
        pose6d=rotations.rotmat_to_rot6d(rotations.random_rotmat(jax.random.PRNGKey(seed), (batch, 23))),
        orient6d=rotations.rotmat_to_rot6d(rotations.random_rotmat(jax.random.PRNGKey(seed + 1), (batch, 1))),
        betas=jnp.asarray(rng.normal(scale=0.4, size=(batch, 10)).astype(np.float32)),
        cam_t=jnp.asarray(
            np.stack([rng.uniform(-0.1, 0.1, batch), rng.uniform(-0.1, 0.1, batch),
                      rng.uniform(25, 30, batch)], axis=-1).astype(np.float32)),
    )
    return model, j_reg, gt


def _cfg(rebin):
    # Camera and silhouette share the 32-px working resolution: with a 224
    # camera the silhouette focal would scale 32/224 (same-frustum rule in
    # losses.rasterizer_spec) and the 160-face body would pack into a couple
    # of tiles, overflowing K with rebin-timing-dependent truncation.
    return dataclasses.replace(
        RefinerConfig(),
        stage_a_steps=5, stage_b_steps=20,
        use_discriminators=False,
        camera=CameraConfig(image_size=32),
        silhouette=SilhouetteConfig(
            image_size=32, tile_size=8, faces_per_tile=96, sigma=5e-3,
            blur_radius=0.05, rebin_interval=rebin, bin_margin_px=4.0,
        ),
    )


def test_rebin_trajectory_close_to_exact():
    model, j_reg, gt = _problem()
    cfg1 = _cfg(rebin=1)
    out = losses.forward_frame(model, gt)
    joints = jreg_lib.apply_jreg(jreg_lib.normalize_jreg(j_reg), out.vertices)
    spec = losses.rasterizer_spec(cfg1)
    mask = S.render_mesh_silhouette(out.vertices, model.faces, gt.cam_t, spec)
    data = losses.FrameBatch(
        gt_j2d=losses.reproject_joints(joints, gt.cam_t, cfg1),
        gt_j3d=joints * 1000.0, mask=mask,
    )
    init = losses.FrameParams(
        pose6d=gt.pose6d + 0.03, orient6d=gt.orient6d + 0.02,
        betas=gt.betas + 0.05, cam_t=gt.cam_t + 0.03,
    )

    res1 = engine.refine_batch(model, j_reg, init, data, cfg1)
    res5 = engine.refine_batch(model, j_reg, init, data, _cfg(rebin=5))
    # Trajectories agree (bins only gate candidate lists; margin covers drift).
    np.testing.assert_allclose(
        np.asarray(res5.params.pose6d), np.asarray(res1.params.pose6d), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(res5.stage_b_terms.silhouette),
        np.asarray(res1.stage_b_terms.silhouette), atol=1e-5,
    )
    assert res5.stage_b_terms.total.shape == (20,)
