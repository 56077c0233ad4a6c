"""Sharding tests on the 8-virtual-device CPU mesh (SURVEY §4)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from jrr_tpu.config import PipelineConfig, RefinerConfig
from jrr_tpu.models import smpl as smpl_mod
from jrr_tpu.ops import jreg as jreg_lib, rotations
from jrr_tpu.parallel import data_parallel, mesh as mesh_lib
from jrr_tpu.refine import losses, trainer


def _cfg():
    return dataclasses.replace(
        PipelineConfig(),
        refiner=dataclasses.replace(
            RefinerConfig(), stage_a_steps=5, stage_b_steps=8,
            use_silhouette=False, use_discriminators=True,
        ),
    )


def _problem(batch, num_verts=96, seed=0):
    model = smpl_mod.synthetic_smpl_model(seed=seed, num_verts=num_verts, num_faces=120)
    rng = np.random.default_rng(seed)
    j_reg = np.zeros((17, num_verts), np.float32)
    for j in range(17):
        j_reg[j, rng.choice(num_verts, size=6, replace=False)] = rng.uniform(0.5, 1.0, 6)
    j_reg = jnp.asarray(j_reg)
    gt = losses.FrameParams(
        pose6d=rotations.rotmat_to_rot6d(rotations.random_rotmat(jax.random.PRNGKey(0), (batch, 23))),
        orient6d=rotations.rotmat_to_rot6d(rotations.random_rotmat(jax.random.PRNGKey(1), (batch, 1))),
        betas=jnp.asarray(rng.normal(scale=0.4, size=(batch, 10)).astype(np.float32)),
        cam_t=jnp.asarray(
            np.stack([rng.uniform(-0.1, 0.1, batch), rng.uniform(-0.1, 0.1, batch),
                      rng.uniform(25, 30, batch)], axis=-1).astype(np.float32)),
    )
    out = losses.forward_frame(model, gt)
    joints = jreg_lib.apply_jreg(jreg_lib.normalize_jreg(j_reg), out.vertices)
    cfg = _cfg()
    data = losses.FrameBatch(
        gt_j2d=losses.reproject_joints(joints, gt.cam_t, cfg.refiner),
        gt_j3d=joints * 1000.0, mask=None,
    )
    init = losses.FrameParams(
        pose6d=gt.pose6d + 0.05, orient6d=gt.orient6d + 0.02,
        betas=gt.betas + 0.05, cam_t=gt.cam_t + 0.05,
    )
    return model, j_reg, init, data, cfg


def test_mesh_has_8_devices():
    mesh = mesh_lib.make_mesh()
    assert mesh.devices.size == 8


def test_sharded_outer_step_matches_single_device():
    batch = 16
    model, j_reg, init, data, cfg = _problem(batch)
    state = trainer.init_train_state(jax.random.PRNGKey(3), j_reg, cfg)

    # Single-device reference.
    s1, m1, r1 = jax.jit(lambda s, i, d: trainer.outer_step(s, model, i, d, cfg))(
        state, init, data
    )

    # 8-way sharded.
    mesh = mesh_lib.make_mesh()
    step = data_parallel.make_sharded_outer_step(mesh, cfg)
    init_sh = mesh_lib.shard_batch(mesh, init)
    data_sh = mesh_lib.shard_batch(mesh, data)
    state_r = mesh_lib.replicate(mesh, state)
    model_r = mesh_lib.replicate(mesh, model)
    s8, m8, r8 = step(state_r, model_r, init_sh, data_sh)

    np.testing.assert_allclose(
        np.asarray(s8.j_reg_raw), np.asarray(s1.j_reg_raw), atol=1e-5
    )
    np.testing.assert_allclose(
        float(m8.mpjpe_after_jreg_step), float(m1.mpjpe_after_jreg_step), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(r8.params.pose6d), np.asarray(r1.params.pose6d), atol=1e-4
    )
    # Refined params actually live sharded over the mesh.
    shards = {d.device for d in r8.params.pose6d.addressable_shards}
    assert len(shards) == 8


def test_sharded_refine_runs():
    batch = 8
    model, j_reg, init, data, cfg = _problem(batch)
    mesh = mesh_lib.make_mesh()
    fn = data_parallel.make_sharded_refine(mesh, cfg.refiner)
    res = fn(
        mesh_lib.replicate(mesh, model), mesh_lib.replicate(mesh, j_reg),
        mesh_lib.shard_batch(mesh, init), mesh_lib.shard_batch(mesh, data),
        None, None,
    )
    assert np.isfinite(np.asarray(res.stage_b_terms.total)).all()


def test_host_shard_slice():
    s = data_parallel.host_shard_slice(256, 4, 2)
    assert (s.start, s.stop) == (128, 192)
