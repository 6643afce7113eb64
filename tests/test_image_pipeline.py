"""Image pipeline tests: device path vs reference-exact host path, using the
real sample images shipped with the reference."""

import numpy as np
import pytest

from vis_zephyr_tpu.data import anyres
from vis_zephyr_tpu.data.image_pipeline import (
    CLIP_MEAN,
    CLIP_STD,
    anyres_preprocess,
    anyres_preprocess_host,
    expand2square_host,
    preprocess_mode_host,
)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

import jax.numpy as jnp  # noqa: E402

PINPOINTS = [(336, 672), (672, 336), (336, 1008), (1008, 336)]
SAMPLE = "/root/reference/playground/data/pretrain/images/00230/002306515.jpg"


@pytest.fixture(scope="module")
def sample_image():
    try:
        return Image.open(SAMPLE).convert("RGB")
    except FileNotFoundError:
        pytest.skip("reference sample image unavailable")


class TestHostPath:
    def test_shapes_and_validity(self, sample_image):
        pixels, valid = anyres_preprocess_host(sample_image, PINPOINTS)
        max_p = anyres.max_anyres_patches(PINPOINTS, 336)
        assert pixels.shape == (max_p, 336, 336, 3)
        n = anyres.num_anyres_patches(sample_image.size, PINPOINTS, 336)
        assert valid.sum() == n
        assert (pixels[n:] == 0).all()

    def test_tiles_are_exact_crops(self, sample_image):
        """Tiles must be normalized crops of the padded canvas, bit-exact."""
        pixels, valid = anyres_preprocess_host(sample_image, PINPOINTS)
        best = anyres.select_best_fit_resolution(sample_image.size, PINPOINTS)
        (nw, nh), (px, py) = anyres.resize_pad_geometry(sample_image.size, best)
        resized = sample_image.resize((nw, nh), Image.Resampling.LANCZOS)
        canvas = Image.new("RGB", best, (0, 0, 0))
        canvas.paste(resized, (px, py))
        box = anyres.tile_boxes(best, 336)[0]
        crop = np.asarray(canvas.crop(box), np.float32) / 255.0
        expect = (crop - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(CLIP_STD, np.float32)
        np.testing.assert_allclose(pixels[1], expect, atol=1e-6)


class TestDevicePath:
    def test_close_to_host_path(self, sample_image):
        """The jittable path must track the PIL path closely (resampling
        kernels differ slightly: lanczos3 vs PIL LANCZOS)."""
        host_px, host_valid = anyres_preprocess_host(sample_image, PINPOINTS)
        best = anyres.select_best_fit_resolution(sample_image.size, PINPOINTS)
        img = jnp.asarray(np.asarray(sample_image, np.uint8))
        dev_px, dev_valid = anyres_preprocess(
            img, target_size=336, best_fit=best, patch_size=336,
            max_patches=anyres.max_anyres_patches(PINPOINTS, 336),
        )
        np.testing.assert_array_equal(np.asarray(dev_valid), host_valid)
        n = int(host_valid.sum())
        # Normalized-space tolerance: resamplers differ at edges; the mean
        # absolute difference must be small.
        diff = np.abs(np.asarray(dev_px[:n]) - host_px[:n])
        assert diff.mean() < 0.03, diff.mean()
        assert np.median(diff) < 0.02

    def test_synthetic_exactness_no_resize(self):
        """When the image already matches the canvas, tiles are exact."""
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (672, 336, 3), np.uint8)  # portrait 1x2
        dev_px, dev_valid = anyres_preprocess(
            jnp.asarray(img), target_size=336, best_fit=(336, 672),
            patch_size=336, max_patches=4,
        )
        assert int(np.sum(np.asarray(dev_valid))) == 3
        f = img.astype(np.float32) / 255.0
        norm = (f - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(CLIP_STD, np.float32)
        np.testing.assert_allclose(np.asarray(dev_px[1]), norm[:336], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dev_px[2]), norm[336:], rtol=1e-4, atol=1e-4)


class TestModes:
    def test_expand2square(self):
        img = Image.new("RGB", (100, 40), (10, 20, 30))
        out = expand2square_host(img, (0, 0, 0))
        assert out.size == (100, 100)
        arr = np.asarray(out)
        assert (arr[50 - 20] != 0).any() and (arr[0] == 0).all()

    @pytest.mark.parametrize("mode", ["pad", "resize", "square"])
    def test_mode_shapes(self, sample_image, mode):
        out = preprocess_mode_host(sample_image, mode)
        assert out.shape == (336, 336, 3)
        assert np.isfinite(out).all()
