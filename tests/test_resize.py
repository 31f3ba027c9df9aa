"""PIL-parity tests for the resampling matrices (the evaluation protocol's
most numerically sensitive piece — reference: helper/utilty.py:211-239)."""

import numpy as np
import pytest
from PIL import Image

from dcscn_tpu.ops import resize


def _pil_resize_float(img2d: np.ndarray, out_wh, method=Image.BICUBIC) -> np.ndarray:
    pil = Image.fromarray(img2d.astype(np.float32), mode="F")
    return np.asarray(pil.resize(out_wh, resample=method), dtype=np.float32)


def _pil_resize_uint8(img: np.ndarray, out_wh, method=Image.BICUBIC) -> np.ndarray:
    mode = "RGB" if img.ndim == 3 and img.shape[2] == 3 else "L"
    pil = Image.fromarray(img, mode=mode)
    return np.asarray(pil.resize(out_wh, resample=method))


@pytest.mark.parametrize("scale", [0.25, 1.0 / 3.0, 0.5, 2.0, 3.0, 4.0])
def test_float_bicubic_matches_pil(scale):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, size=(48, 60)).astype(np.float32)
    out_w, out_h = int(60 * scale), int(48 * scale)
    ours = resize.resize_image(img, scale)
    theirs = _pil_resize_float(img, (out_w, out_h))
    assert ours.shape[:2] == (out_h, out_w)
    np.testing.assert_allclose(ours[:, :, 0], theirs, rtol=0, atol=2e-4)


@pytest.mark.parametrize("scale", [0.5, 2.0, 3.0])
def test_uint8_gray_matches_pil_exactly(scale):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(48, 48), dtype=np.uint8)
    out = resize.resize_image(img, scale)
    ref = _pil_resize_uint8(img, (int(48 * scale), int(48 * scale)))
    diff = np.abs(out[:, :, 0].astype(int) - ref.astype(int))
    # fixed-point arithmetic reproduced exactly
    assert diff.max() == 0, "max diff %d" % diff.max()


@pytest.mark.parametrize("scale", [0.5, 2.0])
def test_uint8_rgb_matches_pil_exactly(scale):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(32, 40, 3), dtype=np.uint8)
    out = resize.resize_image(img, scale)
    ref = _pil_resize_uint8(img, (int(40 * scale), int(32 * scale)))
    assert np.abs(out.astype(int) - ref.astype(int)).max() == 0


@pytest.mark.parametrize("method,pil_method", [
    ("bilinear", Image.BILINEAR),
    ("lanczos", Image.LANCZOS),
    ("nearest", Image.NEAREST),
])
def test_other_kernels_match_pil(method, pil_method):
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, size=(30, 36)).astype(np.float32)
    ours = resize.resize_image(img, 2.0, method=method)
    theirs = _pil_resize_float(img, (72, 60), method=pil_method)
    np.testing.assert_allclose(ours[:, :, 0], theirs, rtol=0, atol=3e-4)


def test_full_reference_pipeline_roundtrip():
    """Emulate the evaluation input path: uint8 RGB -> Y float -> down ->
    up, all in PIL, and check our pipeline matches elementwise."""
    from dcscn_tpu.ops import color

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    y = color.convert_rgb_to_y(img)  # float64 (H, W, 1)

    ours_dn = resize.resize_image(y, 0.5)
    ours_up = resize.resize_image(ours_dn, 2.0)

    pil_dn = _pil_resize_float(y[:, :, 0], (32, 32))
    pil_up = _pil_resize_float(pil_dn, (64, 64))

    np.testing.assert_allclose(ours_dn[:, :, 0], pil_dn, atol=2e-4)
    np.testing.assert_allclose(ours_up[:, :, 0], pil_up, atol=2e-4)


def test_device_resize_matches_host():
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    batch = rng.uniform(0, 255, size=(2, 24, 24, 1)).astype(np.float32)
    fn = resize.device_resize_fn((24, 24), (48, 48))
    dev = np.asarray(fn(jnp.asarray(batch)))
    host = np.stack([resize.resize_image(batch[i], 2.0) for i in range(2)])
    np.testing.assert_allclose(dev, host, atol=1e-3)
