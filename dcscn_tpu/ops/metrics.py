"""PSNR / SSIM with the reference's evaluation protocol.

Protocol (reference: helper/utilty.py:501-536, README.md:209-215):
- both images are rounded (rint) and clipped to [0, 255] as float32
- `border_size` pixels shaved from every border (defaults to `scale`)
- PSNR with data_range 255
- SSIM: win_size 11, gaussian weights sigma=1.5, K1=0.01, K2=0.03,
  data_range 255, sample covariance OFF (gaussian weighting)

Note on the reference's SSIM: it reshapes (H, W, 1) Y images to 2-D and then
calls skimage with ``multichannel=True`` (helper/utilty.py:529-535), which in
old scikit-image treats the *width* axis as channels and averages W
one-dimensional column SSIMs. We implement the standard 2-D
gaussian-weighted SSIM (the intended metric and what skimage computes for a
2-D image without the multichannel flag); README's headline table only
publishes PSNR, which is reproduced exactly.

Implemented with scipy.ndimage on the host and a jittable jnp version
(separable gaussian convs) for on-device evaluation.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
from scipy import ndimage


def trim_image_as_file(image: np.ndarray) -> np.ndarray:
    """Round + clip to the 8-bit range like an image file round-trip
    (reference: helper/utilty.py:501-506)."""
    image = np.rint(image)
    image = np.clip(image, 0, 255)
    if image.dtype != np.float32:
        image = image.astype(np.float32)
    return image


def get_psnr(mse: float, max_value: float = 255.0) -> float:
    """Scalar PSNR from an MSE (reference: helper/utilty.py:561-566)."""
    if mse is None or mse == float("inf") or mse == 0:
        return 0
    return 20 * math.log(max_value / math.sqrt(mse), 10)


def _shave(img: np.ndarray, border: int) -> np.ndarray:
    if border > 0:
        return img[border:-border, border:-border, :]
    return img


def _psnr_from_prepared(image1: np.ndarray, image2: np.ndarray) -> float:
    mse = np.mean((image1.astype(np.float64) - image2.astype(np.float64)) ** 2)
    return 10 * np.log10((255.0**2) / mse) if mse > 0 else float("inf")


def compute_psnr(image1: np.ndarray, image2: np.ndarray, border_size: int = 0) -> float:
    image1, image2 = _prepare_pair(image1, image2, border_size)
    return _psnr_from_prepared(image1, image2)


def _gaussian_window_1d(sigma: float = 1.5, truncate: float = 3.5) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    w = np.exp(-0.5 * (x / sigma) ** 2)
    return w / w.sum()


def _ssim_2d(
    x: np.ndarray,
    y: np.ndarray,
    data_range: float = 255.0,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    truncate: float = 3.5,
) -> float:
    """Gaussian-weighted SSIM on 2-D arrays, skimage-compatible
    (use_sample_covariance=False, pad-cropped mean)."""
    x = x.astype(np.float64)
    y = y.astype(np.float64)

    def filt(a):
        return ndimage.gaussian_filter(a, sigma=sigma, truncate=truncate, mode="nearest")

    ux, uy = filt(x), filt(y)
    uxx, uyy, uxy = filt(x * x), filt(y * y), filt(x * y)
    vx = uxx - ux * ux
    vy = uyy - uy * uy
    vxy = uxy - ux * uy

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    a1 = 2 * ux * uy + c1
    a2 = 2 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)

    radius = int(truncate * sigma + 0.5)
    pad = radius  # (win_size - 1) // 2 with win_size = 2*radius + 1 = 11
    if s.shape[0] <= 2 * pad or s.shape[1] <= 2 * pad:
        raise ValueError(
            "image %s too small for SSIM window %d (skimage raises here too)"
            % (s.shape, 2 * pad + 1))
    return float(s[pad:-pad, pad:-pad].mean())


def _ssim_1d_sample_cov(
    x: np.ndarray,
    y: np.ndarray,
    data_range: float = 255.0,
    sigma: float = 1.5,
    truncate: float = 3.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> float:
    """Old scikit-image structural_similarity on a 1-D signal with
    gaussian_weights=True and default use_sample_covariance=True
    (win 11 -> cov_norm 11/10), 'reflect' padding, pad-cropped mean —
    one column of the reference's literal multichannel call."""
    x = x.astype(np.float64)
    y = y.astype(np.float64)

    def filt(a):
        return ndimage.gaussian_filter1d(a, sigma=sigma, truncate=truncate, mode="reflect")

    radius = int(truncate * sigma + 0.5)
    win = 2 * radius + 1
    cov_norm = win / (win - 1.0)
    ux, uy = filt(x), filt(y)
    uxx, uyy, uxy = filt(x * x), filt(y * y), filt(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux * ux + uy * uy + c1) * (vx + vy + c2))
    return float(s[radius:-radius].mean())


def _ssim_literal_reference(x: np.ndarray, y: np.ndarray) -> float:
    """The value the reference's compute_psnr_and_ssim actually returns for
    a prepared 2-D Y pair: helper/utilty.py:529-535 squeezes (H, W, 1) to
    2-D and calls old skimage with multichannel=True, which treats the
    WIDTH axis as channels — i.e. the mean of per-column 1-D SSIMs along H.
    Exposed via the --reference_ssim flag for byte-compatible comparisons
    against reference-produced logs."""
    return float(np.mean([_ssim_1d_sample_cov(x[:, c], y[:, c]) for c in range(x.shape[1])]))


def _prepare_pair(
    image1: np.ndarray, image2: np.ndarray, border_size: int
) -> Tuple[np.ndarray, np.ndarray]:
    if image1.ndim == 2:
        image1 = image1.reshape(image1.shape[0], image1.shape[1], 1)
    if image2.ndim == 2:
        image2 = image2.reshape(image2.shape[0], image2.shape[1], 1)
    if image1.shape != image2.shape:
        raise ValueError("image shapes differ: %s vs %s" % (image1.shape, image2.shape))
    image1 = trim_image_as_file(image1)
    image2 = trim_image_as_file(image2)
    image1 = _shave(image1, border_size)
    image2 = _shave(image2, border_size)
    return image1, image2


def compute_psnr_and_ssim(
    image1: np.ndarray, image2: np.ndarray, border_size: int = 0,
    literal_ssim: bool = False
) -> Optional[Tuple[float, float]]:
    """PSNR + SSIM under the reference protocol
    (reference: helper/utilty.py:509-536).

    literal_ssim=True reproduces the reference's literal column-averaged
    SSIM (its multichannel-on-2D bug; see module docstring) for
    byte-compatible comparison against reference-produced numbers."""
    if image1.ndim == 2:
        image1 = image1.reshape(image1.shape[0], image1.shape[1], 1)
    if image2.ndim == 2:
        image2 = image2.reshape(image2.shape[0], image2.shape[1], 1)
    if image1.shape != image2.shape:
        return None
    image1, image2 = _prepare_pair(image1, image2, border_size)
    psnr = _psnr_from_prepared(image1, image2)

    if literal_ssim and image1.shape[2] == 1:
        ssim = _ssim_literal_reference(image1[:, :, 0], image2[:, :, 0])
    elif image1.shape[2] == 1:
        ssim = _ssim_2d(image1[:, :, 0], image2[:, :, 0])
    else:
        ssim = float(
            np.mean([_ssim_2d(image1[:, :, c], image2[:, :, c]) for c in range(image1.shape[2])])
        )
    return psnr, ssim


def get_loss_image(
    image1: np.ndarray, image2: np.ndarray, scale: float = 1.0, border_size: int = 0
) -> Optional[np.ndarray]:
    """Squared-error heatmap image (reference: helper/utilty.py:481-498)."""
    if image1.ndim == 2:
        image1 = image1.reshape(image1.shape[0], image1.shape[1], 1)
    if image2.ndim == 2:
        image2 = image2.reshape(image2.shape[0], image2.shape[1], 1)
    if image1.shape != image2.shape:
        return None
    image1 = trim_image_as_file(image1)
    image2 = trim_image_as_file(image2)
    loss_image = np.multiply(np.square(np.subtract(image1, image2)), scale)
    loss_image = np.minimum(loss_image, 255.0)
    return _shave(loss_image, border_size)


# ----------------------------------------------------------------------
# Device (jnp) paths
# ----------------------------------------------------------------------


def psnr_jnp(image1, image2, border_size: int = 0, data_range: float = 255.0):
    """Jittable PSNR on [H, W, C] or [N, H, W, C] arrays (rounded+clipped)."""
    import jax.numpy as jnp

    a = jnp.clip(jnp.rint(image1), 0, 255).astype(jnp.float32)
    b = jnp.clip(jnp.rint(image2), 0, 255).astype(jnp.float32)
    if border_size > 0:
        sl = (Ellipsis, slice(border_size, -border_size), slice(border_size, -border_size), slice(None))
        if a.ndim == 3:
            sl = (slice(border_size, -border_size), slice(border_size, -border_size), slice(None))
        a, b = a[sl], b[sl]
    mse = jnp.mean((a - b) ** 2)
    return 10.0 * jnp.log10((data_range**2) / mse)


def ssim_jnp(image1, image2, data_range: float = 255.0, sigma: float = 1.5, truncate: float = 3.5):
    """Jittable 2-D gaussian SSIM on [H, W] arrays via separable convs."""
    import jax.numpy as jnp

    w = jnp.asarray(_gaussian_window_1d(sigma, truncate), dtype=jnp.float32)
    radius = (w.shape[0] - 1) // 2
    if image1.shape[0] <= 2 * radius or image1.shape[1] <= 2 * radius:
        # the interior slice below would be empty -> silent NaN; fail like
        # the host-side _ssim_2d does for the same input
        raise ValueError(
            "ssim_jnp needs images larger than %dx%d, got %s"
            % (2 * radius, 2 * radius, tuple(image1.shape)))

    def filt(a):
        # 'nearest' edge padding to match scipy, then separable conv
        ap = jnp.pad(a, ((radius, radius), (radius, radius)), mode="edge")
        ap = jnp.apply_along_axis(lambda r: jnp.convolve(r, w, mode="valid"), 1, ap)
        ap = jnp.apply_along_axis(lambda c: jnp.convolve(c, w, mode="valid"), 0, ap)
        return ap

    x = jnp.clip(jnp.rint(image1), 0, 255).astype(jnp.float32)
    y = jnp.clip(jnp.rint(image2), 0, 255).astype(jnp.float32)
    ux, uy = filt(x), filt(y)
    uxx, uyy, uxy = filt(x * x), filt(y * y), filt(x * y)
    vx, vy, vxy = uxx - ux * ux, uyy - uy * uy, uxy - ux * uy
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux * ux + uy * uy + c1) * (vx + vy + c2))
    return jnp.mean(s[radius:-radius, radius:-radius])
