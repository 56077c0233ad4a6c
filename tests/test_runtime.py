"""Native C++ runtime: build, warp parity vs the JAX sampler, pack loader."""

import numpy as np
import jax.numpy as jnp
import pytest

from jrr_tpu import runtime
from jrr_tpu.data import crop as crop_lib
from jrr_tpu.ops import sampling


@pytest.fixture(scope="module")
def lib():
    runtime.build_library()
    return True


class TestWarp:
    def test_matches_jax_sampler(self, lib):
        rng = np.random.default_rng(0)
        img_u8 = rng.integers(0, 256, size=(2, 64, 64, 3), dtype=np.uint8)
        homo = np.asarray(
            [np.eye(3), [[0.5, 0, 0.2], [0, 0.5, -0.1], [0, 0, 1]]], np.float32
        )
        native = runtime.warp_batch(img_u8, homo, (32, 32))

        img_f = img_u8.transpose(0, 3, 1, 2).astype(np.float32) / 255.0
        expected = np.asarray(
            sampling.warp_image(jnp.asarray(img_f), jnp.asarray(homo), (32, 32))
        )
        np.testing.assert_allclose(native, expected, atol=2e-5)

    def test_zero_padding_outside(self, lib):
        img_u8 = np.full((1, 16, 16, 1), 255, np.uint8)
        homo = np.asarray([[[4.0, 0, 0], [0, 4.0, 0], [0, 0, 1]]], np.float32)
        out = runtime.warp_batch(img_u8, homo, (16, 16))
        assert out[0, 0, 0, 0] == 0.0  # corners sample far outside
        assert out[0, 0, 8, 8] > 0.9


class TestPack:
    def test_roundtrip_and_crop_parity(self, lib, tmp_path):
        rng = np.random.default_rng(1)
        n, size = 3, 200
        images = rng.integers(0, 256, size=(n, size, size, 3), dtype=np.uint8)
        masks = rng.integers(0, 256, size=(n, 32, 32), dtype=np.uint8)
        path = str(tmp_path / "test.jrrpack")
        runtime.write_pack(path, images, masks)

        reader = runtime.PackReader(path)
        assert reader.num_frames == n
        assert (reader.img_h, reader.img_w, reader.img_c) == (size, size, 3)

        # bboxes in source pixels (min_y, min_x, max_y, max_x)
        bboxes = np.asarray([[40, 50, 140, 150]] * n, np.float32)
        out = reader.load_batch(np.arange(n), bboxes, spin_res=48, img_res=64)
        assert out["spin_image"].shape == (n, 3, 48, 48)
        assert out["image"].shape == (n, 3, 64, 64)
        np.testing.assert_allclose(out["mask"][0], masks[0] / 255.0, atol=1e-6)

        # Crop parity vs the JAX find_crop pipeline. The JAX path normalizes
        # bbox by IMG_RES=1000; the native path normalizes by the actual pack
        # width — emulate with a 1000-scaled problem only for meta checks:
        # here verify the warp itself matches the JAX warp given the same
        # similarity matrix.
        half = size / 2.0
        nmin_x = (50 - half) / half
        nmax_x = (150 - half) / half
        nmin_y = (40 - half) / half
        nmax_y = (140 - half) / half
        ax, ay = (nmin_x + nmax_x) / 2, (nmin_y + nmax_y) / 2
        scale = max(nmax_x - nmin_x, nmax_y - nmin_y) / 2
        homo = np.asarray(
            [[[scale, 0, ax], [0, scale, ay], [0, 0, 1]]] * n, np.float32
        )
        img_f = images.transpose(0, 3, 1, 2).astype(np.float32) / 255.0
        expected = np.asarray(
            sampling.warp_image(jnp.asarray(img_f), jnp.asarray(homo), (48, 48))
        )
        np.testing.assert_allclose(out["spin_image"], expected, atol=2e-5)

        np.testing.assert_allclose(out["scale"], scale, rtol=1e-5)
        np.testing.assert_allclose(out["min_x"], (ax - scale) * half + half, rtol=1e-4)
        reader.close()

    def test_throughput_smoke(self, lib, tmp_path):
        # Not a benchmark, just proves the threaded path handles volume.
        rng = np.random.default_rng(2)
        images = rng.integers(0, 256, size=(8, 256, 256, 3), dtype=np.uint8)
        masks = rng.integers(0, 2, size=(8, 224, 224), dtype=np.uint8) * 255
        path = str(tmp_path / "vol.jrrpack")
        runtime.write_pack(path, images, masks)
        reader = runtime.PackReader(path, num_threads=4)
        bb = np.asarray([[20, 20, 200, 200]] * 8, np.float32)
        out = reader.load_batch(np.arange(8), bb)
        assert np.isfinite(out["spin_image"]).all()
        reader.close()
