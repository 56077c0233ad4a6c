"""Legacy GT-creation pipeline capabilities.

The reference's `scripts/create_smpl_gt.py` is the quaternion-parameterized
ancestor of the main optimizer (SURVEY §2a). Its live capabilities, rebuilt
TPU-native:

- `estimate_translation`: batched least-squares camera-translation init from
  3D joints + 2D keypoints under known intrinsics
  (reference: scripts/create_smpl_gt.py:229-245 — which is *broken* there, it
  calls a commented-out helper; this is the intended math, the standard
  SMPLify/SPIN closed form, solved batched on the MXU).
- `perspective_projection`: full K·(R·X + t) pinhole projection
  (reference: scripts/create_smpl_gt.py:248-270).
- `find_error_to_gt`: hip-midpoint-centered MSE
  (reference: scripts/create_smpl_gt.py:568-579 — centers at the midpoint of
  joints 0 and 3 before comparing).
- quaternion pose parameterization + `find_joints_quat`
  (reference: scripts/create_smpl_gt.py:279-541,582-596): the rotation
  conversions live in jrr_tpu.ops.rotations; here the SMPL forward takes
  per-joint quaternions directly.
- `find_translation_and_pose`: the staged camera-then-pose fit with hand/feet
  pose gradients zeroed (reference: scripts/create_smpl_gt.py:648-766,
  grad zeroing at :757), compiled as two lax.scan Adam loops.
- `convert_back_to_original_dimensions`: crop-space 2D → source-frame coords
  (reference: scripts/create_smpl_gt.py:35-61).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from jrr_tpu import constants
from jrr_tpu.models import smpl as smpl_lib
from jrr_tpu.ops import jreg as jreg_lib
from jrr_tpu.ops import rotations


def perspective_projection(
    points: jax.Array,  # (B, N, 3)
    rotation: jax.Array,  # (B, 3, 3)
    translation: jax.Array,  # (B, 3)
    focal_length: jax.Array,  # (B,) or scalar
    camera_center: jax.Array,  # (B, 2)
) -> jax.Array:
    """Pinhole projection K·(R·X + t) → (B, N, 2) pixels."""
    p = jnp.einsum("bij,bnj->bni", rotation, points) + translation[:, None]
    p = p / p[..., 2:3]
    f = jnp.broadcast_to(jnp.asarray(focal_length), p.shape[:1])
    x = f[:, None] * p[..., 0] + camera_center[:, None, 0]
    y = f[:, None] * p[..., 1] + camera_center[:, None, 1]
    return jnp.stack([x, y], axis=-1)


def estimate_translation(
    joints_3d: jax.Array,  # (B, N, 3) model joints (camera-rotation-free)
    joints_2d: jax.Array,  # (B, N, 2) pixel coords
    focal_length: float | jax.Array = constants.FOCAL_LENGTH,
    camera_center: Optional[jax.Array] = None,  # (B, 2); default image center 0
    weights: Optional[jax.Array] = None,  # (B, N) confidences
) -> jax.Array:
    """Closed-form least-squares T per frame such that K·(X+T) ≈ x_2d.

    Linearized pinhole system (the standard SMPLify formulation): for each
    joint, f·(X+T)_xy − (x2d − c)·(X+T)_z = 0 — linear in T. Solved batched
    via 3×3 normal equations (one tiny MXU solve per frame).
    """
    b, n = joints_3d.shape[:2]
    f = jnp.broadcast_to(jnp.asarray(focal_length, jnp.float32), (b,))
    if camera_center is None:
        camera_center = jnp.zeros((b, 2))
    if weights is None:
        weights = jnp.ones((b, n))

    uv = joints_2d - camera_center[:, None]  # (B, N, 2)
    x, y, z = joints_3d[..., 0], joints_3d[..., 1], joints_3d[..., 2]
    u, v = uv[..., 0], uv[..., 1]
    fb = f[:, None]

    # Rows: [f, 0, −u]·T = u·z − f·x ; [0, f, −v]·T = v·z − f·y
    zeros = jnp.zeros_like(u)
    a_rows = jnp.stack(
        [
            jnp.stack([fb * jnp.ones_like(u), zeros, -u], axis=-1),
            jnp.stack([zeros, fb * jnp.ones_like(v), -v], axis=-1),
        ],
        axis=2,
    ).reshape(b, 2 * n, 3)
    b_rows = jnp.stack([u * z - fb * x, v * z - fb * y], axis=2).reshape(b, 2 * n)
    w_rows = jnp.repeat(weights, 2, axis=1)

    aw = a_rows * w_rows[..., None]
    ata = jnp.einsum("bni,bnj->bij", aw, a_rows)
    atb = jnp.einsum("bni,bn->bi", aw, b_rows)
    return jnp.linalg.solve(ata + 1e-8 * jnp.eye(3), atb[..., None])[..., 0]


def find_error_to_gt(pred_j3d: jax.Array, gt_j3d: jax.Array) -> jax.Array:
    """Hip-midpoint-centered MSE (reference: scripts/create_smpl_gt.py:568-579)."""
    def center(j):
        mid = (j[:, 0:1] + j[:, 3:4]) / 2.0
        return j - mid

    return jnp.mean((center(pred_j3d) - center(gt_j3d)) ** 2)


def find_joints_quat(
    model: smpl_lib.SMPLModel,
    betas: jax.Array,
    orient_quat: jax.Array,  # (B, 1, 4)
    pose_quat: jax.Array,  # (B, 23, 4)
    j_reg_raw: jax.Array,
    jreg_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Quaternion-parameterized joint regression
    (reference: scripts/create_smpl_gt.py:582-596)."""
    orient = rotations.quat_to_rotmat(orient_quat)
    pose = rotations.quat_to_rotmat(pose_quat)
    out = smpl_lib.smpl_forward(model, betas, orient, pose)
    return jreg_lib.apply_jreg(jreg_lib.normalize_jreg(j_reg_raw, jreg_mask), out.vertices)


class StagedFitResult(NamedTuple):
    orient_quat: jax.Array
    pose_quat: jax.Array
    translation: jax.Array
    stage1_loss: jax.Array  # (steps1,)
    stage2_loss: jax.Array  # (steps2,)


def find_translation_and_pose(
    model: smpl_lib.SMPLModel,
    gt_j3d_mm: jax.Array,  # (B, 17, 3)
    init_orient_quat: jax.Array,  # (B, 1, 4)
    init_pose_quat: jax.Array,  # (B, 23, 4)
    init_translation: jax.Array,  # (B, 3)
    betas: jax.Array,  # (B, 10) held fixed
    j_reg_raw: jax.Array,
    steps_translation: int = 100,
    steps_pose: int = 100,
    lr: float = 1e-2,
    freeze_hand_feet: bool = True,
) -> StagedFitResult:
    """Staged fit: camera translation first, then pose (+ translation), with
    hand/feet pose-quaternion gradients zeroed
    (reference: scripts/create_smpl_gt.py:648-766, zeroing at :757)."""
    gt = jreg_lib.move_pelvis(gt_j3d_mm) / 1000.0

    def joints(orient_q, pose_q, t):
        j = find_joints_quat(model, betas, orient_q, pose_q, j_reg_raw)
        return j + t[:, None]

    def loss_fn(orient_q, pose_q, t):
        j = joints(orient_q, pose_q, t)
        return jnp.mean((jreg_lib.move_pelvis(j) - gt) ** 2)

    # Stage 1: translation only. (Pelvis-centered loss makes it gauge-free;
    # kept for parity with the reference's staging.)
    opt1 = optax.adam(lr)

    def step1(carry, _):
        t, st = carry
        l, g = jax.value_and_grad(lambda t_: loss_fn(init_orient_quat, init_pose_quat, t_))(t)
        up, st = opt1.update(g, st, t)
        return (optax.apply_updates(t, up), st), l

    (t_fit, _), l1 = jax.lax.scan(
        step1, (init_translation, opt1.init(init_translation)), None,
        length=steps_translation,
    )

    # Stage 2: orient + pose quaternions (+ translation).
    opt2 = optax.adam(lr)
    params0 = (init_orient_quat, init_pose_quat, t_fit)
    hand_feet = jnp.asarray(constants.HAND_FEET_ROT_INDICES)

    def step2(carry, _):
        params, st = carry
        l, grads = jax.value_and_grad(lambda p: loss_fn(*p))(params)
        if freeze_hand_feet:
            go, gp, gt_ = grads
            gp = gp.at[:, hand_feet].set(0.0)
            grads = (go, gp, gt_)
        up, st = opt2.update(grads, st, params)
        return (optax.apply_updates(params, up), st), l

    (params, _), l2 = jax.lax.scan(
        step2, (params0, opt2.init(params0)), None, length=steps_pose
    )
    orient_q, pose_q, t_fit = params
    return StagedFitResult(
        orient_quat=orient_q, pose_quat=pose_q, translation=t_fit,
        stage1_loss=l1, stage2_loss=l2,
    )


def convert_back_to_original_dimensions(
    j2d_crop: jax.Array,  # (B, N, 2) coords in the crop (crop_res²)
    min_x: jax.Array, min_y: jax.Array, scale: jax.Array,  # from find_crop
    crop_res: int = constants.CROP_RES,
) -> jax.Array:
    """Inverse of data/crop.reposition_j2d (reference: scripts/create_smpl_gt.py:35-61)."""
    factor = constants.IMG_RES / crop_res
    x = j2d_crop[..., 0] * factor * scale[..., None] + min_x[..., None]
    y = j2d_crop[..., 1] * factor * scale[..., None] + min_y[..., None]
    return jnp.stack([x, y], axis=-1)
