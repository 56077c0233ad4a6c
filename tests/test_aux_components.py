"""Tests: raw-H36M prep loader, perturbation generators, viz, image discriminator."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jrr_tpu.data import perturbation, raw_h36m
from jrr_tpu.models import image_discriminator as imgd
from jrr_tpu.utils import viz


class TestRawH36M:
    def test_load_raw(self, tmp_path):
        h5py = pytest.importorskip("h5py")
        # Build a minimal processed tree: S9/scene1/annot.h5
        scene = tmp_path / "S9" / "scene1"
        os.makedirs(scene)
        n = 5
        with h5py.File(scene / "annot.h5", "w") as f:
            f["camera"] = np.asarray([54, 54, 55, 55, 58])
            f["frame"] = np.arange(1, n + 1)
            f["pose/2d"] = np.random.default_rng(0).normal(size=(n, 32, 2))
            f["pose/3d"] = np.random.default_rng(1).normal(size=(n, 32, 3))
            g = f.create_group("intrinsics")
            for cam in ("54", "55", "58"):
                g[cam] = np.asarray([1100.0, 500.0, 1100.0, 500.0])
        out = raw_h36m.load_raw_h36m(str(tmp_path), "validation")
        assert out["gt_j3d"].shape == (n, 17, 3)
        assert out["gt_j2d"].shape == (n, 17, 2)
        assert out["intrinsics"].shape == (n, 3, 3)
        assert out["intrinsics"][0, 0, 0] == 1100.0
        assert len(out["images"]) == n
        assert "imageSequence/54/img_000001.jpg" in out["images"][0]

    def test_load_precomputed_outputs(self, tmp_path):
        from jrr_tpu.utils.checkpoint import ShardManifest

        man = ShardManifest(str(tmp_path))
        man.write_shard(0, {"betas": np.zeros((4, 10))})
        man.write_shard(1, {"betas": np.ones((4, 10))})
        out = raw_h36m.load_precomputed_outputs(str(tmp_path))
        assert out["betas"].shape == (8, 10)


class TestPerturbation:
    def test_translation_mat(self):
        m = np.asarray(perturbation.translation_vec_to_mat(jnp.asarray([[0.5, -0.2]])))[0]
        np.testing.assert_allclose(m, [[1, 0, 0.5], [0, 1, -0.2], [0, 0, 1]], atol=1e-6)

    def test_rotation_mat(self):
        theta = 0.3
        m = np.asarray(perturbation.rotation_vec_to_mat(jnp.asarray([[theta, 0.0, 0.0]])))[0]
        c, s = np.cos(theta), np.sin(theta)
        np.testing.assert_allclose(m[:2, :2], [[c, -s], [s, c]], atol=1e-6)

    def test_random_perturbation_near_identity(self):
        mats = np.asarray(
            perturbation.gen_random_perturbation(jax.random.PRNGKey(0), 16, 0.05, 0.05, 0.05)
        )
        assert mats.shape == (16, 3, 3)
        assert np.abs(mats - np.eye(3)).max() < 0.25


class TestViz:
    def test_silhouette_comparison(self, tmp_path):
        pytest.importorskip("matplotlib")
        render = np.random.default_rng(0).random((2, 32, 32)).astype(np.float32)
        mask = np.random.default_rng(1).random((2, 32, 32)).astype(np.float32)
        j2d = np.random.default_rng(2).uniform(0, 32, size=(2, 17, 2))
        viz.save_silhouette_comparison(render, mask, str(tmp_path), joints_2d=j2d)
        assert os.path.exists(tmp_path / "000_silhouette.png")

    def test_joints_overlay_and_pointcloud(self, tmp_path):
        pytest.importorskip("matplotlib")
        img = np.zeros((1, 3, 32, 32), np.float32)
        js = np.random.default_rng(3).uniform(0, 32, size=(1, 17, 2))
        viz.save_joints_overlay(img, [js], str(tmp_path))
        assert os.path.exists(tmp_path / "000_joints.png")
        viz.save_pointcloud(
            np.random.default_rng(4).normal(size=(100, 3)), str(tmp_path / "pc.png")
        )
        assert os.path.exists(tmp_path / "pc.png")


class TestImageDiscriminator:
    def test_forward_and_grad(self):
        p = imgd.init_image_discriminator(jax.random.PRNGKey(0))
        img = jnp.zeros((2, 3, 64, 64))
        sil = jnp.ones((2, 64, 64)) * 0.5
        out = imgd.image_discriminator(p, img, sil)
        assert out.shape == (2,)
        assert np.all((np.asarray(out) > 0) & (np.asarray(out) < 1))

        def loss(sil_):
            return jnp.mean((imgd.image_discriminator(p, img, sil_) - 1.0) ** 2)

        g = jax.grad(loss)(sil)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.sum(jnp.abs(g))) > 0
