"""Color conversion, dihedral flips, patch splitting vs reference formulas."""

import numpy as np
import pytest

from dcscn_tpu.ops import color, flips, patches


def _ref_rgb_to_y(image):
    xform = np.array([[65.738 / 256.0, 129.057 / 256.0, 25.064 / 256.0]])
    return image.dot(xform.T) + 16.0


def _ref_rgb_to_ycbcr(image):
    xform = np.array(
        [[65.738 / 256.0, 129.057 / 256.0, 25.064 / 256.0],
         [-37.945 / 256.0, -74.494 / 256.0, 112.439 / 256.0],
         [112.439 / 256.0, -94.154 / 256.0, -18.285 / 256.0]])
    out = image.dot(xform.T)
    out[:, :, 0] += 16.0
    out[:, :, [1, 2]] += 128.0
    return out


def test_rgb_to_y_matches_reference_formula():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8).astype(np.float64)
    np.testing.assert_allclose(color.convert_rgb_to_y(img), _ref_rgb_to_y(img), atol=1e-12)


def test_ycbcr_roundtrip():
    rng = np.random.default_rng(1)
    img = rng.integers(16, 230, size=(8, 8, 3)).astype(np.float64)
    ycbcr = color.convert_rgb_to_ycbcr(img)
    np.testing.assert_allclose(ycbcr, _ref_rgb_to_ycbcr(img.copy()), atol=1e-12)
    back = color.convert_ycbcr_to_rgb(ycbcr)
    np.testing.assert_allclose(back, img, atol=0.6)  # studio-swing matrices are ~inverse


def test_jnp_color_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(2, 8, 8, 3), dtype=np.uint8)
    dev = np.asarray(color.rgb_to_y_jnp(jnp.asarray(img)))
    host = np.stack([color.convert_rgb_to_y(img[i].astype(np.float64)) for i in range(2)])
    np.testing.assert_allclose(dev, host, atol=1e-3)


@pytest.mark.parametrize("flip_type", range(8))
def test_flip_inverses(flip_type):
    rng = np.random.default_rng(flip_type)
    img = rng.uniform(size=(7, 5, 1))
    f = flips.flip(img, flip_type)
    back = flips.flip(f, flip_type, invert=True)
    np.testing.assert_array_equal(back, img)


def test_ensemble_batch_matches_host_flips():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    img = rng.uniform(size=(6, 9, 1)).astype(np.float32)
    batch_a, batch_b = flips.make_ensemble_batch(jnp.asarray(img), 8)
    for i in range(4):
        np.testing.assert_array_equal(np.asarray(batch_a[i]), flips.flip(img, i))
    for i in range(4):
        np.testing.assert_array_equal(np.asarray(batch_b[i]), flips.flip(img, 4 + i))


def test_ensemble_invert_sums_inverses():
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    img = rng.uniform(size=(6, 9, 1)).astype(np.float32)
    # pretend the model is identity: outputs are the flipped inputs
    batch_a, batch_b = flips.make_ensemble_batch(jnp.asarray(img), 8)
    acc = np.asarray(flips.invert_ensemble_batch(batch_a, batch_b))
    np.testing.assert_allclose(acc, 8 * img, rtol=1e-6)


def test_set_image_alignment():
    img = np.arange(7 * 9 * 3).reshape(7, 9, 3)
    out = patches.set_image_alignment(img, 2)
    assert out.shape == (6, 8, 3)
    np.testing.assert_array_equal(out, img[:6, :8, :])


def test_get_split_images_grid():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, size=(10, 12)).astype(np.uint8)
    wins = patches.get_split_images(img, 4, stride=2)
    # reference formula: 1 + (H - win)//stride per axis
    assert wins.shape == (4 * 5, 4, 4, 1)
    np.testing.assert_array_equal(wins[0, :, :, 0], img[:4, :4])
    np.testing.assert_array_equal(wins[1, :, :, 0], img[:4, 2:6])
    np.testing.assert_array_equal(wins[5, :, :, 0], img[2:6, :4])


def test_get_split_images_too_small():
    assert patches.get_split_images(np.zeros((3, 3)), 4) is None
