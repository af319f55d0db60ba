"""Native preprocessing lib vs the cv2/NumPy letterbox path."""

import numpy as np
import pytest

from quan_ultralytics_tpu.data.augment import letterbox
from quan_ultralytics_tpu.data.native import letterbox_native, native_available


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_letterbox_matches_python():
    rng = np.random.default_rng(0)
    im = rng.integers(0, 255, (480, 640, 3), np.uint8)
    res = letterbox_native(im, 256)
    assert res is not None
    out, gain, (px, py) = res
    assert out.shape == (256, 256, 3) and out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0

    ref, r, (dw, dh) = letterbox(im, 256)
    assert abs(gain - r) < 1e-6
    assert (px, py) == (dw, dh)
    # interiors agree closely (different bilinear rounding at edges)
    reff = ref.astype(np.float32) / 255.0
    diff = np.abs(out - reff)
    assert np.quantile(diff, 0.99) < 0.05, float(diff.mean())


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_letterbox_square_input():
    im = np.full((100, 100, 3), 200, np.uint8)
    out, gain, (px, py) = letterbox_native(im, 64)
    assert px == 0 and py == 0
    np.testing.assert_allclose(out, 200 / 255.0, atol=0.02)
