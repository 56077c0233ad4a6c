"""HDF5 single-file dataset mode (the reference's --compute_canada path)."""

import json
import os

import numpy as np
import pytest

from jrr_tpu import constants
from jrr_tpu.data import fixtures, h36m


def test_h5_mode(tmp_path):
    h5py = pytest.importorskip("h5py")
    root = fixtures.write_fixture_dataset(str(tmp_path), num_frames=2, seed=9)

    # Repack the PNG frames into the single data.h5 layout the reference uses
    # (reference: scripts/data.py:92-107): actor/scene/imageSequence/cam/frame
    # and actor/scene/maskSequence/cam/frame, with 5-deep image paths.
    import imageio.v2 as imageio

    ds_png = h36m.H36MDataset(root, "validation")
    with h5py.File(os.path.join(root, "data.h5"), "w") as f:
        new_paths = []
        for i, path in enumerate(ds_png.images):
            img = imageio.imread(path)  # (1000, 1000, 3)
            head, tail = path.split("imageSequence")
            mask = imageio.imread(f"{head}maskSequence{tail}")
            key = f"S9/scene/imageSequence/54/img_{i:06d}.png"
            mkey = f"S9/scene/maskSequence/54/img_{i:06d}.png"
            # reference stores CHW-ish image tensors; ours stores (C, H, W)
            f[key] = np.transpose(img, (2, 0, 1)).astype(np.float32) / 255.0
            f[mkey] = mask[None].astype(np.float32)
            new_paths.append(f"/x/{key}")
        # image paths must split into 5 tail segments
    with open(os.path.join(root, "precomputed_val", "images.json"), "w") as fp:
        json.dump(new_paths, fp)

    ds = h36m.H36MDataset(root, "validation")
    assert ds.use_h5
    item = ds[0]
    assert item["spin_image"].shape == (3, 224, 224)
    assert item["gt_j3d"].shape == (17, 3)

    # Same geometry as the PNG path.
    item_png = ds_png[0]
    np.testing.assert_allclose(item["gt_j2d"], item_png["gt_j2d"], atol=0.5)
