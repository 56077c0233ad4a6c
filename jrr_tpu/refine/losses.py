"""Loss terms for the two-stage refinement.

Mirrors the reference's stage-B objective (reference: scripts/optimize.py:220-253)
with one deliberate efficiency improvement: the reference runs three separate
SMPL forwards per step (find_joints, return_2d_joints, render_mesh —
optimize.py:228-235); here one forward produces vertices that feed all three
terms. Semantics are identical (same function of the same parameters).

Loss scalarization: the reference takes MSE means over the whole batch
(nn.MSELoss default). We take per-frame means and average over frames — with
per-frame Adam states this yields the same trajectories (Adam's per-parameter
normalization cancels uniform gradient scaling), and it makes frames fully
independent, which is what lets the engine vmap/shard them freely.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from jrr_tpu.config import RefinerConfig
from jrr_tpu.models import discriminator as disc_lib
from jrr_tpu.models import smpl as smpl_lib
from jrr_tpu.ops import jreg as jreg_lib
from jrr_tpu.ops import rotations
from jrr_tpu.render import camera as camera_lib
from jrr_tpu.render import silhouette as sil_lib


class FrameBatch(NamedTuple):
    """Per-frame supervision (all arrays batch-first)."""

    gt_j2d: jax.Array  # (B, 17, 2) crop-space pixel coords
    gt_j3d: jax.Array  # (B, 17, 3) millimeters (mocap)
    mask: Optional[jax.Array] = None  # (B, S, S) silhouette in [0, 1]


class FrameParams(NamedTuple):
    """The optimized per-frame state (reference: scripts/optimize.py:177-185)."""

    pose6d: jax.Array  # (B, 23, 6)
    orient6d: jax.Array  # (B, 1, 6)
    betas: jax.Array  # (B, 10)
    cam_t: jax.Array  # (B, 3)


class LossTerms(NamedTuple):
    total: jax.Array
    j2d: jax.Array
    j3d: jax.Array
    silhouette: jax.Array
    pose_disc: jax.Array
    shape_disc: jax.Array


def forward_frame(model: smpl_lib.SMPLModel, params: FrameParams):
    """Rotations + one SMPL forward shared by every loss term."""
    orient = rotations.rot6d_to_rotmat(params.orient6d)  # (B, 1, 3, 3)
    pose = rotations.rot6d_to_rotmat(params.pose6d)  # (B, 23, 3, 3)
    out = smpl_lib.smpl_forward(model, params.betas, orient, pose)
    return out


def joints_from_verts(j_reg_norm: jax.Array, vertices: jax.Array) -> jax.Array:
    return jreg_lib.apply_jreg(j_reg_norm, vertices)


def reproject_joints(joints3d: jax.Array, cam_t: jax.Array, cfg: RefinerConfig) -> jax.Array:
    """(B, J, 3) SMPL-frame joints → (B, J, 2) screen coords."""
    screen = camera_lib.project_points_screen(
        joints3d, cam_t, cfg.camera.image_size, cfg.camera.focal_length
    )
    return screen[..., :2]


def j2d_loss(pred_2d: jax.Array, gt_j2d: jax.Array) -> jax.Array:
    return jnp.mean((pred_2d - gt_j2d) ** 2, axis=(-1, -2))  # (B,)


def j3d_loss(pred_joints_m: jax.Array, gt_j3d_mm: jax.Array) -> jax.Array:
    """Pelvis-centered MSE vs GT in meters (reference: scripts/optimize.py:238-239).

    The reference centers gt once per batch (optimize.py:162) and centers
    predictions inside the loss; we center both here.
    """
    pred = jreg_lib.move_pelvis(pred_joints_m)
    gt = jreg_lib.move_pelvis(gt_j3d_mm) / 1000.0
    return jnp.mean((pred - gt) ** 2, axis=(-1, -2))  # (B,)


def rasterizer_spec(cfg: RefinerConfig) -> sil_lib.RasterizerSpec:
    # The silhouette camera views the SAME frustum as the 2D-joint camera at
    # its own resolution: screen pixel scale is ≈ focal/2 · x/z independent of
    # image_size (camera.py), so rendering at a smaller size requires focal
    # scaled by size ratio or the render would be a center CROP, not a
    # downscale. Identity when both sizes are 224 (the reference setup).
    focal = cfg.camera.focal_length * cfg.silhouette.image_size / cfg.camera.image_size
    return sil_lib.RasterizerSpec(
        image_size=cfg.silhouette.image_size,
        sigma=cfg.silhouette.sigma,
        blur_radius=cfg.silhouette.blur_radius,
        tile_size=cfg.silhouette.tile_size,
        faces_per_tile=cfg.silhouette.faces_per_tile,
        focal_length=focal,
        bin_margin_px=cfg.silhouette.bin_margin_px,
        max_tiles_per_face=cfg.silhouette.max_tiles_per_face,
        pages_per_tile=cfg.silhouette.pages_per_tile,
        backend=cfg.silhouette.backend,
    )


def resolve_silhouette_backend(spec: sil_lib.RasterizerSpec) -> str:
    """"auto" → the fused page-gather path everywhere (Pallas kernel on TPU,
    its XLA twin elsewhere); "pallas"/"xla" force the round-1 paths."""
    return "fused" if spec.backend == "auto" else spec.backend


def silhouette_loss(
    model: smpl_lib.SMPLModel, vertices: jax.Array, cam_t: jax.Array,
    mask: jax.Array, cfg: RefinerConfig, bins=None,
) -> jax.Array:
    """Per-frame MSE between the rendered soft silhouette and the GT mask
    (reference: scripts/optimize.py:234-247). The fused path compares in tile
    space — the same pixel set, never reassembled into an image."""
    # The mask is supervision — stop-gradient on EVERY backend so the fused
    # TPU kernel (zero mask-cotangent by declaration) and the autodiff twins
    # agree exactly on gradient semantics.
    mask = jax.lax.stop_gradient(mask)
    spec = rasterizer_spec(cfg)
    backend = resolve_silhouette_backend(spec)
    if backend == "fused":
        from jrr_tpu.render import silhouette_fused as sf

        mask_tiles = sf.image_to_tiles(mask, spec.tile_size)
        # One-pass kernel on TPU: loss AND gradient tables in a single sweep
        # of the coverage math (value_and_grad costs one launch, not two);
        # the entry point itself routes to the XLA twin off-TPU.
        return sf.silhouette_sq_err_fused(
            vertices, model, cam_t, mask_tiles, spec, bins=bins
        )
    render = sil_lib.render_mesh_silhouette(
        vertices, model.faces, cam_t, spec._replace(backend=backend), bins=bins
    )
    return jnp.mean((render - mask) ** 2, axis=(-1, -2))  # (B,)


def stage_b_loss(
    model: smpl_lib.SMPLModel,
    j_reg_norm: jax.Array,
    pose_disc_params,
    shape_disc_params,
    params: FrameParams,
    data: FrameBatch,
    cfg: RefinerConfig,
    bins=None,
    sil_active=None,
    sil_scale=None,
):
    """Full objective (reference: scripts/optimize.py:252-253). Returns (scalar, LossTerms).

    `sil_active` (traced bool scalar or None): with silhouette step-striding
    (SilhouetteConfig.step_stride > 1) the engine passes the per-step
    predicate; inactive steps skip the rasterizer via lax.cond and active
    steps scale the term by the stride to keep the average contribution.
    `sil_scale` (traced f32 scalar or None): the CURRENT stride when the
    engine runs a scheduled stride (SilhouetteConfig.fine_warm_*); None →
    the static step_stride.
    """
    out = forward_frame(model, params)
    joints = joints_from_verts(j_reg_norm, out.vertices)

    l_j2d = j2d_loss(reproject_joints(joints, params.cam_t, cfg), data.gt_j2d)
    l_j3d = j3d_loss(joints, data.gt_j3d)

    if cfg.use_silhouette and data.mask is not None:
        def sil_fn(verts, cam_t):
            return silhouette_loss(model, verts, cam_t, data.mask, cfg, bins=bins)

        if sil_active is None:
            l_sil = sil_fn(out.vertices, params.cam_t)
        else:
            scale = (
                float(max(1, cfg.silhouette.step_stride))
                if sil_scale is None
                else sil_scale
            )
            l_sil = jax.lax.cond(
                sil_active,
                lambda v, c: sil_fn(v, c) * scale,
                lambda v, c: jnp.zeros((v.shape[0],), v.dtype),
                out.vertices, params.cam_t,
            )
    else:
        l_sil = jnp.zeros_like(l_j3d)

    if cfg.use_discriminators and pose_disc_params is not None:
        rot6d_full = jnp.concatenate([params.orient6d, params.pose6d], axis=1)
        d_pose = disc_lib.pose_discriminator(pose_disc_params, rot6d_full)
        d_shape = disc_lib.shape_discriminator(shape_disc_params, params.betas)
        l_pd = jnp.mean((d_pose - 1.0) ** 2, axis=(-1, -2))
        l_sd = jnp.mean((d_shape - 1.0) ** 2, axis=-1)
    else:
        l_pd = jnp.zeros_like(l_j3d)
        l_sd = jnp.zeros_like(l_j3d)

    w = cfg.loss_weights
    per_frame = (
        l_j2d * w.j2d + l_sil * w.silhouette + l_j3d * w.j3d
        + l_pd * w.pose_disc + l_sd * w.shape_disc
    )
    terms = LossTerms(
        total=jnp.mean(per_frame),
        j2d=jnp.mean(l_j2d),
        j3d=jnp.mean(l_j3d),
        silhouette=jnp.mean(l_sil),
        pose_disc=jnp.mean(l_pd),
        shape_disc=jnp.mean(l_sd),
    )
    return terms.total, terms


def stage_a_loss(
    model: smpl_lib.SMPLModel,
    j_reg_norm: jax.Array,
    params: FrameParams,
    data: FrameBatch,
    cfg: RefinerConfig,
) -> jax.Array:
    """Camera-only 2D alignment objective (reference: scripts/optimize.py:190-199)."""
    out = forward_frame(model, params)
    joints = joints_from_verts(j_reg_norm, out.vertices)
    return jnp.mean(j2d_loss(reproject_joints(joints, params.cam_t, cfg), data.gt_j2d))
