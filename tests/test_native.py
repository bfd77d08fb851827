"""Native C++ tier tests: PNG codec + post filters vs Python references."""

import numpy as np
import pytest

from path_trace_golang_tpu import post
from path_trace_golang_tpu.utils import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="libpt_native.so not built (make -C csrc)"
)


def test_native_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    for shape in ((13, 17, 3), (32, 64, 4), (1, 1, 3)):
        img = rng.integers(0, 256, shape, np.uint8)
        data = native.encode_png(img)
        assert data is not None and data[:8] == b"\x89PNG\r\n\x1a\n"
        p = tmp_path / "n.png"
        p.write_bytes(data)
        from PIL import Image

        back = np.asarray(Image.open(p))
        assert np.array_equal(back, img)


def test_save_png_uses_native(tmp_path):
    from path_trace_golang_tpu.io_png import save_png

    img = np.random.default_rng(1).integers(0, 256, (24, 32, 3), np.uint8)
    p = tmp_path / "x.png"
    save_png(p, img)
    assert p.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"
    from PIL import Image

    assert np.array_equal(np.asarray(Image.open(p)), img)


def test_native_bilateral_matches_jnp():
    img = np.random.default_rng(2).integers(0, 256, (9, 11, 3), np.uint8)
    got = native.bilateral3x3(img, 1.0, 0.15)
    want = np.asarray(post.bilateral_denoise(img))
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1  # f32 vs f64


def test_native_box_smooth_matches_jnp():
    img = np.random.default_rng(3).integers(0, 256, (8, 10, 3), np.uint8)
    got = native.box_smooth(img, 2, 0.5)
    want = np.asarray(post.box_smooth(img, 2, 0.5))
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
