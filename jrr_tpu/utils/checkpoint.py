"""Checkpoint / resume.

The reference has no working checkpointing (its torch.save calls are commented
out — reference: scripts/optimize.py:339-354); the only artifact is the final
regressor. Here (SURVEY §5): the shared TrainState checkpoints via orbax (npz
fallback), and refined per-shard pseudo-GT outputs are written as one file per
shard with a manifest — restart skips completed shards.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

import jax
import numpy as np


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): np.asarray(leaf) for path, leaf in flat}


def save_pytree_npz(path: str, tree: Any) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **_flatten(tree))


def restore_pytree_npz(path: str, template: Any) -> Any:
    with np.load(path) as f:
        data = dict(f)
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths_and_leaves:
        key = jax.tree_util.keystr(path)
        arr = data[key]
        leaves.append(jax.numpy.asarray(arr, dtype=np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_train_state(ckpt_dir: str, state, step: int) -> str:
    """Orbax if available, npz otherwise. Returns the checkpoint path."""
    path = os.path.join(ckpt_dir, f"state_{step:08d}")
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), state, force=True)
        ckptr.wait_until_finished()
        return path
    except Exception:
        save_pytree_npz(path + ".npz", state)
        return path + ".npz"


def restore_train_state(path: str, template):
    if path.endswith(".npz"):
        return restore_pytree_npz(path, template)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)


class ShardManifest:
    """Per-shard output bookkeeping: restart = skip completed shards."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.manifest_path = os.path.join(out_dir, "manifest.json")

    def completed(self) -> List[int]:
        if not os.path.exists(self.manifest_path):
            return []
        with open(self.manifest_path) as f:
            return sorted(json.load(f)["completed"])

    def is_done(self, shard_id: int) -> bool:
        return shard_id in set(self.completed())

    def write_shard(self, shard_id: int, arrays: Dict[str, np.ndarray]) -> str:
        path = os.path.join(self.out_dir, f"shard_{shard_id:06d}.npz")
        tmp = path + ".tmp.npz"
        np.savez(tmp, **arrays)
        os.replace(tmp, path)
        done = set(self.completed()) | {shard_id}
        tmp_m = self.manifest_path + ".tmp"
        with open(tmp_m, "w") as f:
            json.dump({"completed": sorted(done)}, f)
        os.replace(tmp_m, self.manifest_path)
        return path

    def read_shard(self, shard_id: int) -> Dict[str, np.ndarray]:
        with np.load(os.path.join(self.out_dir, f"shard_{shard_id:06d}.npz")) as f:
            return dict(f)
