"""Native C++ image pipeline vs the PIL reference path."""

import io

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from vis_zephyr_tpu.data import native  # noqa: E402
from vis_zephyr_tpu.data.image_pipeline import anyres_preprocess_host  # noqa: E402

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")

PINPOINTS = [(336, 672), (672, 336), (336, 1008), (1008, 336)]


@pytest.fixture
def image(rng):
    # Smooth-ish content so resamplers are comparable (pure noise maximizes
    # kernel differences).
    base = rng.standard_normal((30, 40, 3))
    img = np.kron(base, np.ones((16, 16, 1)))  # 480x640 blocky
    img = (img - img.min()) / (img.max() - img.min()) * 255
    return img.astype(np.uint8)


class TestJpeg:
    def test_decode_roundtrip(self, image):
        buf = io.BytesIO()
        Image.fromarray(image).save(buf, format="JPEG", quality=95)
        data = buf.getvalue()
        got = native.decode_jpeg(data)
        ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        assert got.shape == ref.shape == image.shape
        # libjpeg IDCT implementations may differ by ±1-2 levels.
        assert np.abs(got.astype(int) - ref.astype(int)).mean() < 1.5

    def test_bad_data_raises(self):
        with pytest.raises(ValueError):
            native.decode_jpeg(b"not a jpeg")


class TestResize:
    @pytest.mark.parametrize("size", [(336, 336), (448, 336), (100, 200)])
    def test_matches_pil_lanczos(self, image, size):
        got = native.resize_lanczos(image, size).astype(np.float64)
        ref = np.asarray(
            Image.fromarray(image).resize(size, Image.Resampling.LANCZOS)
        ).astype(np.float64)
        assert got.shape == ref.shape
        diff = np.abs(got - ref)
        assert diff.mean() < 1.0, diff.mean()
        assert np.median(diff) <= 1.0

    def test_upscale(self, image):
        got = native.resize_lanczos(image[:50, :50], (150, 100))
        ref = np.asarray(
            Image.fromarray(image[:50, :50]).resize((150, 100), Image.Resampling.LANCZOS)
        )
        assert np.abs(got.astype(float) - ref.astype(float)).mean() < 1.0


class TestAnyres:
    def test_matches_host_pipeline(self, image):
        got_px, got_valid = native.anyres_preprocess_native(image, PINPOINTS)
        ref_px, ref_valid = anyres_preprocess_host(Image.fromarray(image), PINPOINTS)
        np.testing.assert_array_equal(got_valid, ref_valid)
        n = int(ref_valid.sum())
        diff = np.abs(got_px[:n] - ref_px[:n])
        # Normalized space; ±1 uint8 level ≈ 0.015.
        assert diff.mean() < 0.02, diff.mean()
        # Padding patches zeroed.
        np.testing.assert_array_equal(got_px[n:], 0.0)

    def test_wide_image_grid(self, rng):
        img = (rng.random((500, 2000, 3)) * 255).astype(np.uint8)
        px, valid = native.anyres_preprocess_native(img, PINPOINTS)
        assert valid.sum() == 4  # 3x1 tiles + global
