"""Native (C++) data-path library vs numpy/imageio reference paths."""

import os

import numpy as np
import pytest

from dcscn_tpu.data import native
from dcscn_tpu.ops import color, patches
from dcscn_tpu.utils import imaging

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built and no compiler")


def test_extract_patches_matches_numpy():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (37, 53), dtype=np.uint8)
    for win, stride in ((16, 8), (16, 16), (8, 3)):
        got = native.extract_patches(img, win, stride)
        want = patches.get_split_images(img, win, stride=stride)
        np.testing.assert_array_equal(got, want)


def test_rgb_to_y_matches_reference():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 255, (19, 23, 3), dtype=np.uint8)
    got = native.rgb_to_y(rgb)
    want = color.convert_rgb_to_y(rgb)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_bmp_roundtrip_native(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (21, 34), dtype=np.uint8)  # odd width: padding
    p = str(tmp_path / "x.bmp")
    assert native.write_bmp(p, img)
    back = native.read_bmp(p)
    np.testing.assert_array_equal(back, img)


def test_bmp_cross_compat_with_pil(tmp_path):
    """Native-written BMPs must be readable by imageio/PIL and vice versa."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (18, 26), dtype=np.uint8)

    p1 = str(tmp_path / "native.bmp")
    native.write_bmp(p1, img)
    via_pil = imaging.load_image(p1, print_console=False)
    np.testing.assert_array_equal(via_pil[:, :, 0], img)

    p2 = str(tmp_path / "pil.bmp")
    imaging.save_image(p2, img, print_console=False)
    via_native = native.read_bmp(p2)
    np.testing.assert_array_equal(via_native, img)


def test_bmp_truncated_file_fails_cleanly(tmp_path):
    """A truncated BMP (interrupted write) must be rejected by the bounds
    check, not read out of the buffer."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (48, 48), dtype=np.uint8)
    p = str(tmp_path / "t.bmp")
    assert native.write_bmp(p, img)
    data = open(p, "rb").read()
    # keep the full header + palette but cut the pixel data short
    open(p, "wb").write(data[: 54 + 256 * 4 + 100])
    assert native.read_bmp(p) is None


def test_bmp_batch_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    batch = rng.integers(0, 255, (32, 16, 16, 1), dtype=np.uint8)
    d = str(tmp_path / "store")
    os.makedirs(d)
    assert native.write_bmp_batch(d, batch) == 32
    back = native.read_bmp_batch(d, 32, 16)
    np.testing.assert_array_equal(back, batch)
