"""Native C++ preprocessing library tests (builds on demand via make)."""
import numpy as np
import pytest

from minimagen_tpu.data import native


pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


def test_resize_image_shapes_and_range():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    out = native.resize_image_u8(img, 16)
    assert out.shape == (16, 16, 3)
    assert out.dtype == np.float32
    assert abs(float(out.min())) < 1e-6 and abs(float(out.max()) - 1) < 1e-6  # renormalized


def test_resize_identity_scale_preserves_content():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    out = native.resize_image_u8(img, 32, renorm=False)
    # same-size resample through the cubic kernel is near-identity
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=2e-2)


def test_resize_downscale_antialiasing_averages():
    # checkerboard downscaled 8x should approach mid-gray with AA
    img = np.zeros((64, 64, 3), np.uint8)
    img[::2, ::2] = 255
    img[1::2, 1::2] = 255
    out = native.resize_image_u8(img, 8, renorm=False)
    assert abs(float(out.mean()) - 0.5) < 0.05


def test_batch_matches_single():
    rng = np.random.default_rng(2)
    imgs = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for h, w in [(40, 60), (25, 25), (100, 30)]]
    batch = native.resize_batch_u8(imgs, 16)
    assert batch.shape == (3, 16, 16, 3)
    for i, im in enumerate(imgs):
        single = native.resize_image_u8(im, 16)
        np.testing.assert_allclose(batch[i], single, atol=1e-6)


def test_batch_multithreaded_deterministic():
    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 256, (64, 64, 3), dtype=np.uint8) for _ in range(16)]
    a = native.resize_batch_u8(imgs, 24, n_threads=1)
    b = native.resize_batch_u8(imgs, 24, n_threads=8)
    np.testing.assert_array_equal(a, b)
