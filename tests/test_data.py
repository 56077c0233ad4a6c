"""Data pipeline tests: sampling parity vs torch, crop math, dataset reader."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jrr_tpu import constants
from jrr_tpu.data import crop as crop_lib, fixtures, h36m
from jrr_tpu.ops import sampling


class TestGridSample:
    def test_matches_torch_bilinear(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.default_rng(0)
        img = rng.uniform(size=(2, 3, 20, 24)).astype(np.float32)
        grid = rng.uniform(-1.2, 1.2, size=(2, 8, 9, 2)).astype(np.float32)

        expected = F.grid_sample(
            torch.from_numpy(img), torch.from_numpy(grid),
            mode="bilinear", padding_mode="zeros", align_corners=False,
        ).numpy()
        got = np.asarray(sampling.grid_sample(jnp.asarray(img), jnp.asarray(grid)))
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_warp_identity_matches_torch_pipeline(self):
        # Full warp chain (linspace mesh -> homography -> grid_sample) vs an
        # independent torch replay of the reference sampler
        # (scripts/sampling_helper.py:15-69).
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.default_rng(1)
        img = rng.uniform(size=(1, 3, 16, 16)).astype(np.float32)
        h = np.asarray([[[0.5, 0.0, 0.1], [0.0, 0.5, -0.2], [0.0, 0.0, 1.0]]], np.float32)
        out_shape = (8, 8)

        got = np.asarray(sampling.warp_image(jnp.asarray(img), jnp.asarray(h), out_shape))

        ys, xs = torch.meshgrid(
            torch.linspace(-1, 1, out_shape[0]), torch.linspace(-1, 1, out_shape[1]),
            indexing="ij",
        )
        xy = torch.stack([xs.flatten(), ys.flatten(), torch.ones(64)])
        warped = torch.from_numpy(h) @ xy
        xyw = warped[:, :2] / (warped[:, 2:] + 1e-8)
        grid = torch.stack(
            [xyw[:, 0].view(1, 8, 8), xyw[:, 1].view(1, 8, 8)], dim=-1
        )
        expected = F.grid_sample(
            torch.from_numpy(img), grid, mode="bilinear",
            padding_mode="zeros", align_corners=False,
        ).numpy()
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_linearized_value_equals_bilinear(self):
        rng = np.random.default_rng(2)
        img = jnp.asarray(rng.uniform(size=(1, 2, 12, 12)).astype(np.float32))
        grid = jnp.asarray(rng.uniform(-0.9, 0.9, size=(1, 5, 5, 2)).astype(np.float32))
        a = sampling.grid_sample(img, grid, mode="bilinear")
        b = sampling.grid_sample(img, grid, mode="linearized", key=jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_linearized_gradient_finite_nonzero(self):
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.uniform(size=(1, 1, 12, 12)).astype(np.float32))
        grid0 = jnp.asarray(rng.uniform(-0.5, 0.5, size=(1, 4, 4, 2)).astype(np.float32))

        def loss(g):
            return jnp.sum(
                sampling.grid_sample(img, g, mode="linearized", key=jax.random.PRNGKey(1))
            )

        g = jax.grad(loss)(grid0)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.sum(jnp.abs(g))) > 0


class TestCropMath:
    def test_similarity_vec_to_mat(self):
        vec = jnp.asarray([[0.0, 2.0, 3.0, 0.5, -0.5]])
        m = np.asarray(crop_lib.similarity_vec_to_mat(vec))[0]
        # R(0)·S·T = [[sx, 0, sx·dx], [0, sy, sy·dy], [0, 0, 1]]
        np.testing.assert_allclose(m, [[2, 0, 1.0], [0, 3, -1.5], [0, 0, 1]], atol=1e-6)

    def test_intrinsics_formulas(self):
        intr = jnp.asarray([[[1100.0, 0, 500], [0, 1150, 480], [0, 0, 1]]])
        c = np.asarray(
            crop_lib.crop_intrinsics(intr, jnp.asarray([400.0]), jnp.asarray([400.0]),
                                     jnp.asarray([300.0]), jnp.asarray([320.0]))
        )[0]
        np.testing.assert_allclose(c[0, 2], 500 + 399 / 2 - 320, atol=1e-4)
        np.testing.assert_allclose(c[1, 2], 480 + 399 / 2 - 300, atol=1e-4)
        r = np.asarray(
            crop_lib.resize_intrinsics(intr, jnp.asarray([400.0]), jnp.asarray([400.0]),
                                       jnp.asarray([0.56]))
        )[0]
        np.testing.assert_allclose(r[0, 0], 1100 * 0.56, atol=1e-3)
        np.testing.assert_allclose(
            r[0, 2], (0.56 * 400 - 1) / 2 + 0.56 * (500 - 399 / 2), atol=1e-3
        )

    def test_find_crop_centers_bbox(self):
        # A delta at the bbox center ends up at the crop center.
        img = np.zeros((1, 1, 1000, 1000), np.float32)
        img[0, 0, 396:404, 296:304] = 1.0  # center (400, 300) as (y, x)
        bbox = jnp.asarray([[300.0, 200.0, 500.0, 400.0]])  # center y=400, x=300
        intr = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
        res = crop_lib.find_crop(jnp.asarray(img), bbox, intr, img_size=64)
        out = np.asarray(res.image[0, 0])
        cy, cx = np.unravel_index(np.argmax(out), out.shape)
        assert abs(cy - 32) <= 2 and abs(cx - 32) <= 2
        np.testing.assert_allclose(float(res.scale[0]), 0.2, atol=1e-6)

    def test_reposition_j2d_roundtrip(self):
        # Source joints inside a square bbox map to crop coords consistently
        # with the crop's min/scale outputs.
        bbox = jnp.asarray([[100.0, 200.0, 500.0, 600.0]])
        intr = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
        img = jnp.zeros((1, 1, 1000, 1000))
        res = crop_lib.find_crop(img, bbox, intr, img_size=224)
        src = jnp.asarray([[[400.0, 300.0], [200.0, 100.0]]])  # (x, y)
        crop_coords = crop_lib.reposition_j2d(src, res.min_x, res.min_y, res.scale)
        # bbox center (x=400, y=300) should land at crop center 112.
        np.testing.assert_allclose(np.asarray(crop_coords[0, 0]), [112, 112], atol=0.5)


class TestFixtureDataset:
    def test_write_and_read(self, tmp_path):
        root = fixtures.write_fixture_dataset(str(tmp_path), num_frames=3, seed=0)
        ds = h36m.H36MDataset(root, "validation")
        assert len(ds) == 3
        item = ds[0]
        assert set(item.keys()) == {
            "bboxes", "betas", "cam", "gt_j2d", "gt_j3d", "valid", "mask_rcnn",
            "image", "spin_image", "intrinsics", "orient", "pose", "inc_gt",
        }
        assert item["spin_image"].shape == (3, 224, 224)
        assert item["image"].shape == (3, 256, 256)
        assert item["gt_j3d"].shape == (17, 3)
        assert item["valid"] is True
        assert item["mask_rcnn"][0, 0, 0] == 0  # marker zeroed

    def test_depth_range(self, tmp_path):
        """depth_range controls projected body scale: the SPIN-crop-realistic
        (36, 60) draw (weak-persp s 0.75-1.25, same statistics as bench.py's
        synthetic camera) yields stored translations in range and a smaller
        silhouette than the historical oversized-body default (18, 28)."""
        root = fixtures.write_fixture_dataset(
            str(tmp_path / "spin"), num_frames=3, seed=0,
            depth_range=(36.0, 60.0),
        )
        z = np.load(
            str(tmp_path / "spin" / "precomputed_val" / "tensors.npz")
        )["estimated_translation"][:, 2]
        assert np.all((z > 35.0) & (z < 61.0)), z

        from jrr_tpu.models import smpl as smpl_lib

        model = smpl_lib.synthetic_smpl_model(seed=0, num_verts=256, num_faces=500)
        rng = np.random.default_rng(0)
        j_reg = np.zeros((17, 256), np.float32)
        for j in range(17):
            j_reg[j, rng.choice(256, 6, replace=False)] = rng.uniform(0.5, 1.0, 6)
        _, d_near = fixtures.make_synthetic_frames(
            model, j_reg, 4, seed=0, image_size=64
        )
        _, d_far = fixtures.make_synthetic_frames(
            model, j_reg, 4, seed=0, image_size=64, depth_range=(36.0, 60.0)
        )
        near = float(np.mean(np.asarray(d_near.mask)))
        far = float(np.mean(np.asarray(d_far.mask)))
        assert far < near, (near, far)

    def test_batch_loader(self, tmp_path):
        root = fixtures.write_fixture_dataset(str(tmp_path), num_frames=6, seed=1)
        ds = h36m.H36MDataset(root, "validation")
        loader = h36m.BatchLoader(ds, batch_size=4, seed=0, drop_last=False)
        batches = list(iter(loader))
        assert len(batches) == 2
        assert batches[0]["gt_j3d"].shape == (4, 17, 3)
        assert batches[1]["gt_j3d"].shape == (2, 17, 3)
        # Deterministic across instances.
        again = list(iter(h36m.BatchLoader(ds, batch_size=4, seed=0)))
        np.testing.assert_array_equal(batches[0]["gt_j3d"], again[0]["gt_j3d"])

    def test_epoch_reshuffle(self, tmp_path):
        """set_epoch must change the batch order but keep determinism
        (reference: --train_epochs + DataLoader(shuffle=True) reshuffles per
        epoch, scripts/args.py:7, scripts/optimize.py:136-139)."""
        root = fixtures.write_fixture_dataset(str(tmp_path), num_frames=16, seed=3)
        ds = h36m.H36MDataset(root, "validation")
        loader = h36m.BatchLoader(ds, batch_size=16, seed=0)
        loader.set_epoch(0)
        e0 = loader._indices()
        loader.set_epoch(1)
        e1 = loader._indices()
        assert not np.array_equal(e0, e1)
        assert sorted(e0.tolist()) == sorted(e1.tolist())
        loader.set_epoch(0)
        np.testing.assert_array_equal(loader._indices(), e0)

    def test_host_sharded_indices_partition(self, tmp_path):
        root = fixtures.write_fixture_dataset(str(tmp_path), num_frames=8, seed=2)
        ds = h36m.H36MDataset(root, "validation")
        parts = [
            h36m.BatchLoader(ds, 4, seed=0, num_hosts=2, host_id=i)._indices()
            for i in range(2)
        ]
        all_idx = np.concatenate(parts)
        assert len(set(all_idx.tolist())) == 8
