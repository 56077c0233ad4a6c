"""Native packed pipeline: pack conversion + batch contract parity vs the
python reader."""

import numpy as np
import pytest

from jrr_tpu.data import fixtures, h36m, native_pipeline


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("native_ds"))
    fixtures.write_fixture_dataset(root, num_frames=5, seed=4)
    return root


def test_pack_and_load(fixture_root):
    ds = native_pipeline.PackedH36MDataset(fixture_root, "validation", num_threads=2)
    assert len(ds) == 5
    batch = ds.load_batch(np.arange(4))
    assert batch["spin_image"].shape == (4, 3, 224, 224)
    assert batch["image"].shape == (4, 3, 256, 256)
    assert batch["mask_rcnn"].shape[0] == 4
    assert batch["gt_j3d"].shape == (4, 17, 3)
    assert batch["valid"].all()  # fixture sets the marker pixel


def test_matches_python_reader(fixture_root):
    ds_native = native_pipeline.PackedH36MDataset(fixture_root, "validation")
    ds_py = h36m.H36MDataset(fixture_root, "validation")
    nb = ds_native.load_batch(np.asarray([0, 2]))
    for i, src in enumerate([0, 2]):
        item = ds_py[src]
        np.testing.assert_allclose(nb["spin_image"][i], item["spin_image"], atol=2e-2)
        np.testing.assert_allclose(nb["gt_j2d"][i], item["gt_j2d"], atol=0.5)
        np.testing.assert_allclose(nb["betas"][i], item["betas"], atol=1e-6)


def test_batches_iterator(fixture_root):
    ds = native_pipeline.PackedH36MDataset(fixture_root, "validation")
    batches = list(ds.batches(batch_size=2, seed=0))
    assert len(batches) == 2  # 5 frames, drop_last
    assert batches[0]["spin_image"].shape[0] == 2
