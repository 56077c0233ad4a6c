"""Offline raw-Human3.6M preparation (the reference's `load_data` path).

Walks processed H36M actor/scene directories with `annot.h5` files, extracts
per-frame image paths, GT 2D/3D joints reindexed to the 17-joint evaluation
skeleton, and per-camera intrinsics
(reference: scripts/data.py:274-351). Host-side, numpy only.

Also `load_precomputed_outputs`: reads back previously saved refinement
outputs (reference: scripts/data.py:354-382) — in this framework those are
the per-shard npz files written by utils/checkpoint.ShardManifest.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List

import numpy as np

from jrr_tpu import constants

TRAIN_ACTORS = ("S1", "S5", "S6", "S7", "S8")
VAL_ACTORS = ("S9", "S11")


def load_raw_h36m(root: str, split: str = "validation") -> Dict[str, np.ndarray]:
    """root: directory containing processed/{actor}/{scene}/annot.h5 trees."""
    import h5py

    actors = TRAIN_ACTORS if split == "train" else VAL_ACTORS
    scenes: List[str] = []
    for actor in actors:
        scenes.extend(sorted(glob.glob(os.path.join(root, actor, "*"))))

    images: List[str] = []
    gt_j3d, gt_j2d, intrinsics = [], [], []
    gt_idx = np.asarray(constants.GT_2_J17)

    for scene in scenes:
        with h5py.File(os.path.join(scene, "annot.h5"), "r") as f:
            camera = np.asarray(f["camera"])
            frame = np.asarray(f["frame"])
            images.extend(
                os.path.join(scene, "imageSequence", str(camera[i]), f"img_{frame[i]:06d}.jpg")
                for i in range(camera.shape[0])
            )
            gt_j2d.append(np.asarray(f["pose/2d"])[:, gt_idx])
            gt_j3d.append(np.asarray(f["pose/3d"])[:, gt_idx])

            intr = np.zeros((camera.shape[0], 3, 3), np.float32)
            for i in range(camera.shape[0]):
                cam_params = np.asarray(f["intrinsics"][str(camera[i])])
                intr[i, 0, 0] = cam_params[0]
                intr[i, 0, 2] = cam_params[1]
                intr[i, 1, 1] = cam_params[2]
                intr[i, 1, 2] = cam_params[3]
                intr[i, 2, 2] = 1.0
            intrinsics.append(intr)

    return {
        "images": np.asarray(images),
        "gt_j3d": np.concatenate(gt_j3d).astype(np.float32),
        "gt_j2d": np.concatenate(gt_j2d).astype(np.float32),
        "intrinsics": np.concatenate(intrinsics),
    }


def load_precomputed_outputs(out_dir: str) -> Dict[str, np.ndarray]:
    """Concatenate all completed shards of a previous optimization run."""
    from jrr_tpu.utils.checkpoint import ShardManifest

    man = ShardManifest(out_dir)
    shards = [man.read_shard(i) for i in man.completed()]
    if not shards:
        return {}
    return {k: np.concatenate([s[k] for s in shards]) for k in shards[0]}
