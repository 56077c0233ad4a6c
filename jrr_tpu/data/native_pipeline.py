"""Production input pipeline backed by the native C++ runtime.

`pack_dataset` converts a converted-layout dataset directory (tensors.npz +
image/mask files, see data/h36m.py) into one memory-mapped `.jrrpack` blob;
`PackedH36MDataset` then serves the reference's 13-key batch contract with all
image decode/warp work done by the C++ thread pool (jrr_tpu/runtime) — no
Python in the per-frame loop. This replaces the reference's
DataLoader-workers + torch grid_sample host path (SURVEY §2c "Host data
parallelism").
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from jrr_tpu import constants
from jrr_tpu.data import h36m as h36m_lib


def pack_dataset(root: str, split: str = "validation", out_path: Optional[str] = None) -> str:
    """One-time: PNG/HDF5 frames+masks → a single .jrrpack mmap blob."""
    from jrr_tpu import runtime

    ds = h36m_lib.H36MDataset(root, split)
    if out_path is None:
        out_path = os.path.join(ds.dir, "frames.jrrpack")

    images, masks = [], []
    for i in range(len(ds)):
        img, mask = ds._read_frame_images(i)
        images.append((np.transpose(img, (1, 2, 0)) * 255).astype(np.uint8))
        masks.append((mask[0] * 255).astype(np.uint8))
    runtime.write_pack(out_path, np.stack(images), np.stack(masks))
    return out_path


def build_pack2(
    root: str, split: str = "validation", out_path: Optional[str] = None,
    chunk: int = 256, num_threads: int = 0,
) -> str:
    """One-time: v1 pack (raw frames) → PRE-WARPED v2 pack.

    Runs the C++ decode+warp over every frame ONCE with the dataset's own
    (static) bboxes and stores the quantized u8 crops + crop meta; steady-
    state load becomes a memcpy-grade u8→f32 conversion (VERDICT r3 item 7).
    """
    from jrr_tpu import runtime
    from jrr_tpu import constants

    ds = h36m_lib.H36MDataset(root, split)
    pack_path = os.path.join(ds.dir, "frames.jrrpack")
    if not os.path.exists(pack_path):
        pack_path = pack_dataset(root, split)
    reader = runtime.PackReader(pack_path, num_threads=num_threads)
    if out_path is None:
        out_path = os.path.join(ds.dir, "frames.jrrpack2")

    n = len(ds)
    q = lambda x: np.clip(np.rint(x * 255.0), 0, 255).astype(np.uint8)
    writer = runtime.Pack2Writer(
        out_path, n, constants.CROP_RES, constants.IMAGE_CROP_RES,
        reader.img_c, reader.mask_h, reader.mask_w,
    )
    for i0 in range(0, n, chunk):
        idx = np.arange(i0, min(i0 + chunk, n))
        bb = ds.tensors["bboxes"][idx].astype(np.float32)
        nb = reader.load_batch(
            idx, bb, spin_res=constants.CROP_RES,
            img_res=constants.IMAGE_CROP_RES,
        )
        meta = np.stack([nb["min_x"], nb["min_y"], nb["scale"]], axis=1)
        writer.append(q(nb["spin_image"]), q(nb["image"]), q(nb["mask"]), meta)
    writer.close()
    reader.close()
    return out_path


class PackedH36MDataset:
    """Batch-level dataset over a pack file (use directly, not via BatchLoader:
    the native runtime assembles whole batches).

    `prewarped="auto"` (default) uses the pre-warped v2 pack when
    frames.jrrpack2 exists; True builds it on first use; False forces the
    raw v1 pack (decode+warp per load)."""

    def __init__(self, root: str, split: str = "validation", num_threads: int = 0,
                 prewarped="auto"):
        from jrr_tpu import runtime

        self.base = h36m_lib.H36MDataset(root, split)
        pack2_path = os.path.join(self.base.dir, "frames.jrrpack2")
        if prewarped is True and not os.path.exists(pack2_path):
            build_pack2(root, split, num_threads=num_threads)
        self.prewarped = prewarped is True or (
            prewarped == "auto" and os.path.exists(pack2_path)
        )
        if self.prewarped:
            self.reader = runtime.Pack2Reader(pack2_path, num_threads=num_threads)
            return
        pack_path = os.path.join(self.base.dir, "frames.jrrpack")
        if not os.path.exists(pack_path):
            pack_path = pack_dataset(root, split)
        self.reader = runtime.PackReader(pack_path, num_threads=num_threads)

    def __len__(self) -> int:
        return len(self.base)

    def frame_order(self):
        """Temporal identity (seq_ids, frame_nos) or None — the pack stores
        frames by dataset index, so identity comes from the base dataset's
        contract (explicit seq_id/frame_id tensors or image paths)."""
        return self.base.frame_order()

    def load_batch(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        t = self.base.tensors
        idx = np.asarray(indices)
        bboxes = t["bboxes"][idx].astype(np.float32)
        if self.prewarped:
            native = self.reader.load_batch(idx)  # bbox baked in at build
        else:
            native = self.reader.load_batch(
                idx, bboxes,
                spin_res=constants.CROP_RES, img_res=constants.IMAGE_CROP_RES,
            )

        mask = native["mask"]
        valid = mask[:, 0, 0] != 0
        mask = mask.copy()
        mask[:, :2, :2] = 0  # zero the valid-flag marker (scripts/data.py:130-132)

        # j2d repositioning; note the native scale is normalized by the pack's
        # own width — rescale to the reference's IMG_RES convention if needed.
        j2d = t["gt_j2d"][idx].astype(np.float32).copy()
        factor = constants.IMG_RES / constants.CROP_RES
        j2d[..., 0] = (j2d[..., 0] - native["min_x"][:, None]) / native["scale"][:, None] / factor
        j2d[..., 1] = (j2d[..., 1] - native["min_y"][:, None]) / native["scale"][:, None] / factor

        return {
            "bboxes": bboxes,
            "betas": t["betas"][idx].astype(np.float32),
            "cam": t["estimated_translation"][idx].astype(np.float32),
            "gt_j2d": j2d,
            "gt_j3d": t["gt_j3d"][idx].astype(np.float32),
            "valid": valid,
            "mask_rcnn": mask[:, None],
            "image": native["image"],
            "spin_image": native["spin_image"],
            "intrinsics": t["intrinsics"][idx].astype(np.float32),
            "orient": t["orient"][idx].astype(np.float32),
            "pose": t["pose"][idx].astype(np.float32),
            "inc_gt": np.ones(len(idx), bool),
        }

    def batches(
        self, batch_size: int, seed: int = 0, shuffle: bool = True,
        drop_last: bool = True, num_hosts: int = 1, host_id: int = 0,
        epoch: int = 0,
    ):
        n = len(self)
        order = np.arange(n)
        if shuffle:
            # (seed, epoch) keyed like BatchLoader.set_epoch: per-epoch
            # reshuffle, deterministic across hosts.
            order = np.random.default_rng((seed, epoch)).permutation(n)
        per = n // num_hosts
        order = order[host_id * per : (host_id + 1) * per]
        for i in range(0, len(order), batch_size):
            chunk = order[i : i + batch_size]
            if drop_last and len(chunk) < batch_size:
                break
            yield self.load_batch(chunk)
