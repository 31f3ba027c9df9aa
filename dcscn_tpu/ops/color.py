"""ITU-R BT.601 studio-swing color transforms.

Same coefficients and offsets as the reference (helper/utilty.py:142-193):
Y  =  (65.738 R + 129.057 G + 25.064 B)/256 + 16
Cb = (-37.945 R -  74.494 G + 112.439 B)/256 + 128
Cr = (112.439 R -  94.154 G -  18.285 B)/256 + 128
and the 298.082/256-based inverse.

numpy host path (float64, matching reference arithmetic) plus jnp device
path (float32, fused by XLA).
"""

from __future__ import annotations

import numpy as np

RGB_TO_Y = np.array([65.738, 129.057, 25.064], dtype=np.float64) / 256.0
RGB_TO_YCBCR = (
    np.array(
        [
            [65.738, 129.057, 25.064],
            [-37.945, -74.494, 112.439],
            [112.439, -94.154, -18.285],
        ],
        dtype=np.float64,
    )
    / 256.0
)
YCBCR_OFFSET = np.array([16.0, 128.0, 128.0], dtype=np.float64)
YCBCR_TO_RGB = (
    np.array(
        [
            [298.082, 0.0, 408.583],
            [298.082, -100.291, -208.120],
            [298.082, 516.412, 0.0],
        ],
        dtype=np.float64,
    )
    / 256.0
)


def convert_rgb_to_y(image: np.ndarray) -> np.ndarray:
    """RGB -> Y plane. Pass-through for <=1-channel input
    (reference: helper/utilty.py:142-149)."""
    if image.ndim <= 2 or image.shape[2] == 1:
        return image
    return image[..., :3].astype(np.float64) @ RGB_TO_Y[:, None] + 16.0


def convert_rgb_to_ycbcr(image: np.ndarray) -> np.ndarray:
    """RGB -> YCbCr (reference: helper/utilty.py:152-165).

    The `ndim < 2` guard (vs convert_rgb_to_y's `<= 2`) reproduces the
    reference's own asymmetry (utilty.py:153): a bare 2-D array raises
    here, passes through there. Kept for behavioral parity; in-repo
    callers always pass [H, W, C]."""
    if image.ndim < 2 or image.shape[2] == 1:
        return image
    out = image[..., :3].astype(np.float64) @ RGB_TO_YCBCR.T
    out += YCBCR_OFFSET
    return out


def convert_ycbcr_to_rgb(ycbcr_image: np.ndarray) -> np.ndarray:
    """YCbCr -> RGB (reference: helper/utilty.py:168-179)."""
    shifted = ycbcr_image.astype(np.float64) - YCBCR_OFFSET
    return shifted @ YCBCR_TO_RGB.T


def convert_y_and_cbcr_to_rgb(y_image: np.ndarray, cbcr_image: np.ndarray) -> np.ndarray:
    """Recombine an SR'd Y plane with (bicubic-upscaled) CbCr
    (reference: helper/utilty.py:182-193)."""
    if y_image.ndim <= 2:
        y_image = y_image.reshape(y_image.shape[0], y_image.shape[1], 1)
    if y_image.ndim == 3 and y_image.shape[2] == 3:
        y_image = y_image[:, :, 0:1]

    ycbcr = np.zeros([y_image.shape[0], y_image.shape[1], 3], dtype=np.float64)
    ycbcr[:, :, 0] = y_image[:, :, 0]
    ycbcr[:, :, 1:3] = cbcr_image[:, :, 0:2]
    return convert_ycbcr_to_rgb(ycbcr)


# ----------------------------------------------------------------------
# Device (jnp) path — used in the on-device training data pipeline
# ----------------------------------------------------------------------


def rgb_to_y_jnp(images):
    """Batched NHWC RGB -> NHW1 Y on device."""
    import jax.numpy as jnp

    coeff = jnp.asarray(RGB_TO_Y, dtype=jnp.float32)
    y = jnp.tensordot(images.astype(jnp.float32), coeff, axes=(-1, 0)) + 16.0
    return y[..., None]


def rgb_to_ycbcr_jnp(images):
    import jax.numpy as jnp

    mat = jnp.asarray(RGB_TO_YCBCR.T, dtype=jnp.float32)
    off = jnp.asarray(YCBCR_OFFSET, dtype=jnp.float32)
    return images.astype(jnp.float32) @ mat + off


def ycbcr_to_rgb_jnp(images):
    import jax.numpy as jnp

    mat = jnp.asarray(YCBCR_TO_RGB.T, dtype=jnp.float32)
    off = jnp.asarray(YCBCR_OFFSET, dtype=jnp.float32)
    return (images.astype(jnp.float32) - off) @ mat
