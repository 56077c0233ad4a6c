"""Human3.6M precomputed-tensor dataset reader.

Mirrors the reference's data layout and __getitem__ contract
(reference: scripts/data.py:28-163): a directory of per-frame tensors

    bboxes, betas, estimated_translation, gt_j2d, gt_j3d, intrinsics,
    orient, pose            (arrays, N leading)
    images, pixel_annotations (path lists)

plus on-disk 1000² frame images and silhouette masks (mask path = image path
with imageSequence→maskSequence, reference: scripts/data.py:115-116). The
torch `.pt` layout of the reference converts once via `convert_precomputed_pt`.

Each item is the reference's 13-key dict (reference: scripts/data.py:140-158):
two differentiable crops (224 SPIN crop + 256 image crop), GT 2D joints
repositioned into crop coords, intrinsics updated for the crop, the
`valid` flag read from the mask's top-left marker pixel and the marker zeroed
(reference: scripts/data.py:130-132).

Host-side only — everything returns numpy; the TPU never sees this module.
An HDF5 single-file mode replaces the reference's --compute_canada path
(reference: scripts/data.py:92-107).
"""

from __future__ import annotations

import json
import os
import re
import threading
import queue as queue_mod
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from jrr_tpu import constants
from jrr_tpu.data import crop as crop_lib

TENSOR_KEYS = (
    "bboxes", "betas", "estimated_translation", "gt_j2d", "gt_j3d",
    "intrinsics", "orient", "pose",
)


def convert_precomputed_pt(src_dir: str, dst_dir: str) -> None:
    """One-time converter: reference torch .pt/.pkl directory → .npz/.json."""
    import pickle

    import torch

    os.makedirs(dst_dir, exist_ok=True)
    arrays = {}
    for key in TENSOR_KEYS:
        t = torch.load(os.path.join(src_dir, f"{key}.pt"), map_location="cpu")
        arrays[key] = t.numpy()
    np.savez(os.path.join(dst_dir, "tensors.npz"), **arrays)
    for name in ("images", "pixel_annotations"):
        p = os.path.join(src_dir, f"{name}.pkl")
        if os.path.exists(p):
            with open(p, "rb") as f:
                paths = pickle.load(f)
            with open(os.path.join(dst_dir, f"{name}.json"), "w") as f:
                json.dump(list(paths), f)


def _crop_np(image_chw: np.ndarray, bbox: np.ndarray, intrinsics: np.ndarray, img_size: int):
    """Single-frame crop on the host CPU via the JAX implementation."""
    import jax

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        res = crop_lib.find_crop(
            np.asarray(image_chw, np.float32)[None],
            np.asarray(bbox, np.float32)[None],
            np.asarray(intrinsics, np.float32)[None],
            img_size=img_size,
        )
        return (
            np.asarray(res.image[0]),
            float(res.min_x[0]), float(res.min_y[0]), float(res.scale[0]),
            np.asarray(res.intrinsics[0]),
        )


class H36MDataset:
    """Reads one split directory (converted layout)."""

    def __init__(self, root: str, split: str = "validation"):
        sub = "precomputed_train" if split == "train" else "precomputed_val"
        self.dir = os.path.join(root, sub)
        with np.load(os.path.join(self.dir, "tensors.npz")) as f:
            self.tensors = {k: f[k] for k in f.files}
        img_json = os.path.join(self.dir, "images.json")
        self.images: Optional[List[str]] = None
        if os.path.exists(img_json):
            with open(img_json) as f:
                self.images = json.load(f)
        self.h5_path = os.path.join(root, "data.h5")
        self.use_h5 = os.path.exists(self.h5_path) and self.images is not None

    def __len__(self) -> int:
        return self.tensors["gt_j3d"].shape[0]

    def frame_order(self) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """Temporal identity of every frame: (seq_ids, frame_nos) int arrays.

        The reference's data is ordered video (scripts/data.py:274-382 walks
        sequence directories frame by frame), but its eval DataLoaders shuffle
        — sequence consumers (VIBE/MEVA) need the order back. Two sources, in
        priority order:

        1. explicit `seq_id` / `frame_id` arrays in tensors.npz (the converted
           dataset contract; fixtures write them);
        2. derived from images.json paths — sequence = the image's directory,
           frame number = the trailing integer in the filename (the raw-H36M
           layout: .../imageSequence/<cam>/img_000001.jpg).

        Returns None when neither is available (ordering unknown — sequence
        eval must not silently assume it)."""
        t = self.tensors
        if "seq_id" in t and "frame_id" in t:
            return t["seq_id"].astype(np.int64), t["frame_id"].astype(np.int64)
        if self.images is not None:
            seq_of: Dict[str, int] = {}
            seq_ids = np.empty(len(self.images), np.int64)
            frame_nos = np.empty(len(self.images), np.int64)
            for i, p in enumerate(self.images):
                d, b = os.path.split(p)
                seq_ids[i] = seq_of.setdefault(d, len(seq_of))
                digits = re.findall(r"\d+", b)
                frame_nos[i] = int(digits[-1]) if digits else i
            return seq_ids, frame_nos
        return None

    def load_batch(self, indices) -> Dict[str, np.ndarray]:
        """Stack arbitrary frame indices into one batch dict."""
        items = [self[int(i)] for i in indices]
        out = {}
        for k in items[0]:
            vals = [it[k] for it in items]
            out[k] = np.stack(vals) if isinstance(vals[0], np.ndarray) else np.asarray(vals)
        return out

    def _read_frame_images(self, index: int):
        """Returns (image (3, 1000, 1000) float [0,1], mask (1, Hm, Wm))."""
        if self.images is None:
            r = constants.IMG_RES
            return (
                np.zeros((3, r, r), np.float32),
                np.zeros((1, constants.CROP_RES, constants.CROP_RES), np.float32),
            )
        path = self.images[index]
        if self.use_h5:
            import h5py

            parts = path.split("/")[-5:]
            with h5py.File(self.h5_path, "r") as f:
                image = np.asarray(f[f"{parts[0]}/{parts[1]}/{parts[2]}/{parts[3]}/{parts[4]}"])
                mask = np.asarray(
                    f[f"{parts[0]}/{parts[1]}/maskSequence/{parts[3]}/{parts[4]}"]
                ) / 255.0
        else:
            import imageio.v2 as imageio

            image = imageio.imread(path)
            image = np.transpose(image, (2, 0, 1)).astype(np.float32)
            image = image[:, : constants.IMG_RES, : constants.IMG_RES] / 255.0
            head, tail = path.split("imageSequence")
            mask = imageio.imread(f"{head}maskSequence{tail}").astype(np.float32) / 255.0
        if mask.ndim == 2:
            mask = mask[None]
        return image.astype(np.float32), mask.astype(np.float32)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        t = self.tensors
        image, mask = self._read_frame_images(index)

        # valid flag lives in the mask's top-left pixel; zero the marker
        # (reference: scripts/data.py:130-132).
        valid = bool(mask[0, 0, 0] != 0)
        mask = mask.copy()
        mask[:, :2, :2] = 0

        bbox = t["bboxes"][index]
        intr = t["intrinsics"][index]
        spin_image, *_ = _crop_np(image, bbox, intr, constants.CROP_RES)
        image_crop, min_x, min_y, scale, new_intr = _crop_np(
            image, bbox, intr, constants.IMAGE_CROP_RES
        )

        j2d = t["gt_j2d"][index].astype(np.float32).copy()
        j2d[..., 0] = (j2d[..., 0] - min_x) / scale / (constants.IMG_RES / constants.CROP_RES)
        j2d[..., 1] = (j2d[..., 1] - min_y) / scale / (constants.IMG_RES / constants.CROP_RES)

        return {
            "bboxes": bbox.astype(np.float32),
            "betas": t["betas"][index].astype(np.float32),
            "cam": t["estimated_translation"][index].astype(np.float32),
            "gt_j2d": j2d,
            "gt_j3d": t["gt_j3d"][index].astype(np.float32),
            "valid": valid,
            "mask_rcnn": mask,
            "image": image_crop,
            "spin_image": spin_image,
            "intrinsics": new_intr.astype(np.float32),
            "orient": t["orient"][index].astype(np.float32),
            "pose": t["pose"][index].astype(np.float32),
            "inc_gt": True,
        }


class BatchLoader:
    """Shuffling, prefetching batch iterator (replaces torch DataLoader;
    reference: scripts/optimize.py:136-139). Deterministic sharded indexing:
    every host computes the same permutation and takes its contiguous slice
    (SURVEY §5 'race detection' — determinism instead of locks)."""

    def __init__(
        self, dataset, batch_size: int, seed: int = 0, shuffle: bool = True,
        drop_last: bool = False, num_hosts: int = 1, host_id: int = 0,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_hosts = num_hosts
        self.host_id = host_id
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Reseed the shuffle per epoch (torch DistributedSampler-style): each
        epoch sees a different permutation, deterministically derived from
        (seed, epoch). The reference's DataLoader(shuffle=True) reshuffles per
        epoch implicitly (scripts/optimize.py:136-139)."""
        self.epoch = int(epoch)

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            idx = np.random.default_rng((self.seed, self.epoch)).permutation(n)
        per_host = n // self.num_hosts
        return idx[self.host_id * per_host : (self.host_id + 1) * per_host]

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _load_batch(self, batch_idx: np.ndarray) -> Dict[str, np.ndarray]:
        items = [self.dataset[int(i)] for i in batch_idx]
        out = {}
        for k in items[0]:
            vals = [it[k] for it in items]
            out[k] = np.stack(vals) if isinstance(vals[0], np.ndarray) else np.asarray(vals)
        return out


    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._indices()
        batches = [
            idx[i : i + self.batch_size]
            for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        sentinel = object()

        def worker():
            try:
                for b in batches:
                    q.put(self._load_batch(b))
            finally:
                q.put(sentinel)

        thread = threading.Thread(target=worker, daemon=True)
        thread.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item


def sequence_chunk_indices(
    seq_ids: np.ndarray, frame_nos: np.ndarray, seqlen: int
) -> np.ndarray:
    """(num_chunks, seqlen) dataset indices for sequence-consumer eval.

    Per sequence: frames sorted by frame number, truncated to a multiple of
    `seqlen` (the reference's chunking drops remainders too, reference:
    scripts/test.py:254-273). Chunks never cross a sequence boundary."""
    chunks = []
    for s in np.unique(seq_ids):
        idx = np.nonzero(seq_ids == s)[0]
        idx = idx[np.argsort(frame_nos[idx], kind="stable")]
        n = (len(idx) // seqlen) * seqlen
        if n:
            chunks.append(idx[:n].reshape(-1, seqlen))
    if not chunks:
        return np.zeros((0, seqlen), np.int64)
    return np.concatenate(chunks, axis=0)


def ordered_sequence_batches(
    load_fn, order: Tuple[np.ndarray, np.ndarray], batch_size: int, seqlen: int
) -> Iterator[Dict[str, np.ndarray]]:
    """Non-shuffling iterator for `evaluate_consumer_sequences`: each yielded
    batch concatenates whole temporally-ordered chunks (frame count a multiple
    of `seqlen`, never crossing a sequence), ≤ `batch_size` frames per batch.

    `load_fn(indices) -> batch dict` — `H36MDataset.load_batch` or
    `PackedH36MDataset.load_batch`; `order` — `frame_order()` of the dataset.
    """
    chunks = sequence_chunk_indices(order[0], order[1], seqlen)
    per = max(1, batch_size // seqlen)
    for i in range(0, len(chunks), per):
        yield load_fn(chunks[i : i + per].reshape(-1))
