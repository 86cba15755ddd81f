"""Native (C++) preprocessing path: exactness without resize, closeness with."""

import numpy as np
import pytest

from glimpseprune_tpu.preprocessing.image import preprocess_image

native = pytest.importorskip("glimpseprune_tpu.preprocessing.native")


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        pytest.skip("native library unavailable (no g++?)")


def test_native_exact_when_no_resize():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (112, 140, 3), dtype=np.uint8)
    ref, g1 = preprocess_image(img, resized_hw=(112, 140))
    out, g2 = native.preprocess_image_native(img, resized_hw=(112, 140))
    assert g1 == g2
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_native_close_with_resize():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (300, 500, 3), dtype=np.uint8)
    ref, g1 = preprocess_image(img)
    out, g2 = native.preprocess_image_native(img)
    assert g1 == g2
    d = np.abs(out - ref)
    # PIL's fixed-point 2-pass vs our f64 intermediates: tiny drift allowed
    assert d.mean() < 0.01
    assert np.percentile(d, 99) < 0.05


def test_native_resize_matches_pil_closely():
    from PIL import Image

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (200, 333, 3), dtype=np.uint8)
    ours = native.resize_bicubic_native(img, 112, 140)
    pil = np.asarray(Image.fromarray(img).resize((140, 112), Image.BICUBIC))
    diff = np.abs(ours.astype(int) - pil.astype(int))
    assert diff.mean() < 1.0  # sub-level average difference
    assert (diff > 8).mean() < 0.01
