"""Hermetic synthetic fixtures in the exact dataset schema.

SURVEY §4 "Golden-file parity": CI and the eval harness never need Human3.6M.
`write_fixture_dataset` materializes a tiny dataset directory (tensors.npz +
images.json + PNG frames/masks) whose geometry is *self-consistent*: frames
are generated from the SMPL model, 2D joints are true projections, and masks
are true rendered silhouettes — so end-to-end parity checks have a recoverable
ground truth by construction.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from jrr_tpu import constants
from jrr_tpu.models import smpl as smpl_lib
from jrr_tpu.ops import jreg as jreg_lib, rotations
from jrr_tpu.refine import losses
from jrr_tpu.render import silhouette as sil_lib


def make_synthetic_frames(
    model: smpl_lib.SMPLModel,
    j_reg_raw,
    num_frames: int,
    seed: int = 0,
    image_size: int = constants.CROP_RES,
    render_masks: bool = True,
    pose_scale: float = 1.0,
    depth_range: tuple = (18.0, 28.0),
):
    """Returns (FrameParams gt, FrameBatch data) on the default backend.

    `depth_range` sets the camera z draw. The historical default (18, 28)
    projects bodies 1.5-2.5× LARGER than a real SPIN crop (weak-perspective
    scale s = 2·focal/(S·z) = 1.6-2.5 at focal 5000 / S 224 — the body
    overflows the crop); it is kept as the default because golden fixtures
    and many tests are pinned to it, and an oversized body is a useful
    rasterizer stress. Pass (36.0, 60.0) for SPIN-crop-realistic scale
    (s ≈ 0.75-1.25, the same range bench.py's synthetic problem uses —
    reference: scripts/optimize.py:170-173 weak-persp init)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    gt = losses.FrameParams(
        pose6d=rotations.rotmat_to_rot6d(
            rotations.random_rotmat(key, (num_frames, 23))
        ) * pose_scale,
        orient6d=rotations.rotmat_to_rot6d(
            rotations.random_rotmat(jax.random.PRNGKey(seed + 1), (num_frames, 1))
        ),
        betas=jnp.asarray(rng.normal(scale=0.4, size=(num_frames, 10)).astype(np.float32)),
        cam_t=jnp.asarray(
            np.stack(
                [rng.uniform(-0.1, 0.1, num_frames), rng.uniform(-0.1, 0.1, num_frames),
                 rng.uniform(depth_range[0], depth_range[1], num_frames)], axis=-1,
            ).astype(np.float32)
        ),
    )
    out = losses.forward_frame(model, gt)
    joints = jreg_lib.apply_jreg(jreg_lib.normalize_jreg(jnp.asarray(j_reg_raw)), out.vertices)

    from jrr_tpu.config import RefinerConfig
    cfg = RefinerConfig()
    gt_j2d = losses.reproject_joints(joints, gt.cam_t, cfg)

    mask = None
    if render_masks:
        spec = sil_lib.RasterizerSpec(image_size=image_size)
        # Chunked: at thousands of frames a single batched render would
        # materialize per-tile intermediates for the whole batch at once
        # (multi-GB on the CPU XLA path used for large fixture builds).
        chunk = 512
        mask = jnp.concatenate(
            [
                sil_lib.render_mesh_silhouette(
                    out.vertices[i : i + chunk], model.faces,
                    gt.cam_t[i : i + chunk], spec,
                )
                for i in range(0, num_frames, chunk)
            ],
            axis=0,
        ) if num_frames > chunk else sil_lib.render_mesh_silhouette(
            out.vertices, model.faces, gt.cam_t, spec
        )

    data = losses.FrameBatch(gt_j2d=gt_j2d, gt_j3d=joints * 1000.0, mask=mask)
    return gt, data


def write_fixture_dataset(
    root: str,
    num_frames: int = 8,
    seed: int = 0,
    model: Optional[smpl_lib.SMPLModel] = None,
    j_reg_raw: Optional[np.ndarray] = None,
    num_sequences: int = 2,
    depth_range: tuple = (18.0, 28.0),
) -> str:
    """Write a dataset directory consumable by `H36MDataset(root, 'validation')`.

    Frames are grouped into `num_sequences` video sequences: explicit
    seq_id/frame_id arrays land in tensors.npz and the image paths are laid
    out as imageSequence/seq{k}/img_{frame:06d}.png — both sources of
    `H36MDataset.frame_order` (the reference's data is ordered video,
    reference: scripts/data.py:274-382)."""
    import imageio.v2 as imageio
    import jax.numpy as jnp

    if model is None:
        model = smpl_lib.synthetic_smpl_model(seed=seed, num_verts=256, num_faces=500)
    if j_reg_raw is None:
        rng = np.random.default_rng(seed)
        j_reg_raw = np.zeros((17, model.num_verts), np.float32)
        for j in range(17):
            j_reg_raw[j, rng.choice(model.num_verts, size=6, replace=False)] = rng.uniform(
                0.5, 1.0, 6
            )

    gt, data = make_synthetic_frames(
        model, j_reg_raw, num_frames, seed=seed, depth_range=depth_range
    )

    split_dir = os.path.join(root, "precomputed_val")
    img_dir = os.path.join(root, "imageSequence")
    mask_dir = os.path.join(root, "maskSequence")
    os.makedirs(split_dir, exist_ok=True)

    # Temporal identity: contiguous frame ranges per sequence.
    seq_id = (np.arange(num_frames) * num_sequences) // max(1, num_frames)
    frame_id = np.arange(num_frames) - np.searchsorted(seq_id, seq_id)
    for k in range(num_sequences):
        os.makedirs(os.path.join(img_dir, f"seq{k:03d}"), exist_ok=True)
        os.makedirs(os.path.join(mask_dir, f"seq{k:03d}"), exist_ok=True)

    r = constants.IMG_RES
    # Place each crop-space render back into a 1000² frame at a known bbox.
    images = []
    rng = np.random.default_rng(seed + 2)
    bboxes = np.zeros((num_frames, 4), np.float32)
    gt_j2d_src = np.zeros((num_frames, 17, 2), np.float32)
    masks224 = np.asarray(data.mask)  # (N, 224, 224)
    j2d_crop = np.asarray(data.gt_j2d)

    for i in range(num_frames):
        side = int(rng.uniform(320, 620))
        oy = int(rng.uniform(0, r - side))
        ox = int(rng.uniform(0, r - side))
        bboxes[i] = (oy, ox, oy + side, ox + side)  # (min_y, min_x, max_y, max_x)

        # Upsample the 224 silhouette into the frame window (nearest).
        m = masks224[i]
        yy = (np.arange(side) * constants.CROP_RES / side).astype(int)
        m_big = m[yy][:, yy]
        frame = np.zeros((r, r), np.float32)
        frame[oy : oy + side, ox : ox + side] = m_big

        # 2D joints: crop coords → source-frame coords (inverse of
        # reposition_j2d with scale = side/1000).
        scale = side / r
        gt_j2d_src[i, :, 0] = j2d_crop[i, :, 0] * (r / constants.CROP_RES) * scale + ox
        gt_j2d_src[i, :, 1] = j2d_crop[i, :, 1] * (r / constants.CROP_RES) * scale + oy

        img_u8 = (np.stack([frame] * 3, -1) * 255).astype(np.uint8)
        # Masks are stored at the silhouette working resolution (224²), which
        # is what the refinement loss compares against (the reference's mask
        # files are likewise render-resolution; scripts/optimize.py:236).
        mask_u8 = (m * 255).astype(np.uint8)
        mask_u8[0, 0] = 255  # the reference's valid-flag marker pixel
        rel = os.path.join(f"seq{seq_id[i]:03d}", f"img_{frame_id[i]:06d}.png")
        img_path = os.path.join(img_dir, rel)
        imageio.imwrite(img_path, img_u8)
        imageio.imwrite(os.path.join(mask_dir, rel), mask_u8)
        images.append(img_path)

    intr = np.zeros((num_frames, 3, 3), np.float32)
    intr[:, 0, 0] = intr[:, 1, 1] = 1100.0
    intr[:, 0, 2] = intr[:, 1, 2] = 500.0
    intr[:, 2, 2] = 1.0

    # Stored pose/betas/cam play the role of the reference's precomputed SPIN
    # *predictions* (scripts/data.py:50-69): noisy initial estimates, while
    # gt_j2d/gt_j3d stay exact — refinement has real error to remove.
    prng = np.random.default_rng(seed + 3)
    noisy = lambda x, s: np.asarray(x) + prng.normal(scale=s, size=np.shape(x)).astype(
        np.float32
    )
    np.savez(
        os.path.join(split_dir, "tensors.npz"),
        bboxes=bboxes,
        betas=noisy(gt.betas, 0.1),
        estimated_translation=noisy(gt.cam_t, 0.05),
        gt_j2d=gt_j2d_src,
        gt_j3d=np.asarray(data.gt_j3d),
        intrinsics=intr,
        orient=noisy(gt.orient6d, 0.03),
        pose=noisy(gt.pose6d, 0.06),
        seq_id=seq_id.astype(np.int64),
        frame_id=frame_id.astype(np.int64),
    )
    with open(os.path.join(split_dir, "images.json"), "w") as f:
        json.dump(images, f)
    return root
