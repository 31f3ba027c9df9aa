"""Separable resampling with PIL-exact semantics, as matrix products.

The reference's entire evaluation protocol hinges on PIL's resampler
(reference: helper/utilty.py:211-239 — `resize_image_by_pil`): LR inputs are
produced by `Image.resize(..., BICUBIC)` and the network's bicubic skip input
is produced the same way, so PSNR parity requires reproducing PIL's kernel
bit-for-bit, not a generic bicubic.

TPU-first design: a 1-D resample is a sparse band matrix applied to the image
rows/columns. We precompute the (out, in) weight matrix per axis once per
(in_size, out_size) pair and evaluate `W_v @ img @ W_h.T` — two matmuls that
XLA tiles straight onto the MXU. The same matrices drive the exact numpy host
path and the jitted device path.

PIL semantics reproduced here (Pillow src/libImaging/Resample.c):
- kernel: bicubic a=-0.5, support 2 (also bilinear support 1, nearest,
  lanczos support 3)
- downscale antialias: filterscale = max(in/out, 1.0); support *= filterscale;
  taps evaluated at ((x - center + 0.5) / filterscale); weights normalized
- tap window: xmin = int(center - support + 0.5) clipped to 0,
  xmax = int(center + support + 0.5) clipped to in_size
- float ("F" mode) images: float64 coefficient accumulation, stored float32
  per pass, horizontal pass then vertical pass
- uint8 ("L"/"RGB") images: coefficients quantized to int32 with
  PRECISION_BITS = 32-8-2, accumulated in int64 with rounding bias, clipped
  to [0, 255] per pass
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

_PRECISION_BITS = 32 - 8 - 2  # Pillow Resample.c precision for 8-bit images


def _bicubic_kernel(x: np.ndarray) -> np.ndarray:
    # Pillow bicubic_filter with a = -0.5
    a = -0.5
    x = np.abs(x)
    out = np.where(x < 1.0, ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0, 0.0)
    out = np.where((x >= 1.0) & (x < 2.0), (((x - 5.0) * x + 8.0) * x - 4.0) * a, out)
    return out


def _bilinear_kernel(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    return np.where(x < 1.0, 1.0 - x, 0.0)


def _lanczos_kernel(x: np.ndarray) -> np.ndarray:
    def sinc(v):
        return np.where(v == 0, 1.0, np.sin(np.pi * v) / np.where(v == 0, 1.0, np.pi * v))

    x = np.abs(x)
    return np.where(x < 3.0, sinc(x) * sinc(x / 3.0), 0.0)


_KERNELS = {
    "bicubic": (_bicubic_kernel, 2.0),
    "bilinear": (_bilinear_kernel, 1.0),
    "lanczos": (_lanczos_kernel, 3.0),
}


@functools.lru_cache(maxsize=256)
def resample_matrix(in_size: int, out_size: int, method: str = "bicubic") -> np.ndarray:
    """Dense (out_size, in_size) float64 PIL-exact resampling matrix."""
    if method == "nearest":
        # PIL NEAREST: src index = floor((i + 0.5) * in/out) clipped
        idx = np.minimum((np.arange(out_size) + 0.5) * in_size / out_size, in_size - 1).astype(np.int64)
        mat = np.zeros((out_size, in_size), dtype=np.float64)
        mat[np.arange(out_size), idx] = 1.0
        return mat

    kernel, support0 = _KERNELS[method]
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = support0 * filterscale
    inv_fs = 1.0 / filterscale

    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = int(center - support + 0.5)
        if xmin < 0:
            xmin = 0
        xmax = int(center + support + 0.5)
        if xmax > in_size:
            xmax = in_size
        taps = np.arange(xmin, xmax, dtype=np.float64)
        w = kernel((taps - center + 0.5) * inv_fs)
        ssum = w.sum()
        if ssum != 0.0:
            w = w / ssum
        mat[i, xmin:xmax] = w
    return mat


def _resample_axis_float(img: np.ndarray, mat: np.ndarray, axis: int) -> np.ndarray:
    """One float-image pass: float64 accumulate, store float32 (PIL 'F')."""
    moved = np.moveaxis(img.astype(np.float64), axis, 0)
    out = np.tensordot(mat, moved, axes=(1, 0)).astype(np.float32)
    return np.moveaxis(out, 0, axis)


def _resample_axis_uint8(img: np.ndarray, mat: np.ndarray, axis: int) -> np.ndarray:
    """One uint8-image pass with Pillow's fixed-point arithmetic."""
    # Pillow rounds coefficients half-away-from-zero via C truncation:
    # (int)(w * (1<<P) + (w < 0 ? -0.5 : 0.5))
    scaled = mat * (1 << _PRECISION_BITS)
    kq = np.trunc(scaled + np.where(scaled < 0, -0.5, 0.5)).astype(np.int64)
    moved = np.moveaxis(img.astype(np.int64), axis, 0)
    acc = np.tensordot(kq, moved, axes=(1, 0))
    acc = (acc + (1 << (_PRECISION_BITS - 1))) >> _PRECISION_BITS
    out = np.clip(acc, 0, 255).astype(np.uint8)
    return np.moveaxis(out, 0, axis)


def resize_image(image: np.ndarray, scale: float, method: str = "bicubic") -> np.ndarray:
    """PIL-exact resize on the host, matching `resize_image_by_pil`
    (reference: helper/utilty.py:211-239).

    - output size: int(w * scale) x int(h * scale)
    - 2-D or (H, W, 1) float input -> PIL 'F' mode arithmetic, returns
      (H', W', 1) float32
    - (H, W, 3) uint8 input -> PIL 'RGB' fixed-point arithmetic
    - 2-D or (H, W, 1) uint8 input -> PIL 'L' fixed-point arithmetic
    """
    height, width = image.shape[0], image.shape[1]
    new_width = int(width * scale)
    new_height = int(height * scale)
    return resize_to(image, (new_height, new_width), method)


def resize_to(image: np.ndarray, out_hw: Tuple[int, int], method: str = "bicubic") -> np.ndarray:
    new_height, new_width = out_hw
    height, width = image.shape[0], image.shape[1]

    squeeze = False
    if image.ndim == 3 and image.shape[2] == 1:
        image = image[:, :, 0]
        squeeze = True
    elif image.ndim == 2:
        # reference reshapes 2-D to (H, W) for PIL and the caller receives
        # (H', W', 1) back (helper/utilty.py:234-238)
        squeeze = True

    mat_h = resample_matrix(width, new_width, method)
    mat_v = resample_matrix(height, new_height, method)

    if image.dtype == np.uint8:
        # PIL does horizontal then vertical for both passes
        out = _resample_axis_uint8(image, mat_h, axis=1)
        out = _resample_axis_uint8(out, mat_v, axis=0)
    else:
        out = _resample_axis_float(image, mat_h, axis=1)
        out = _resample_axis_float(out, mat_v, axis=0)

    if squeeze:
        out = out.reshape(new_height, new_width, 1)
    return out


# ----------------------------------------------------------------------
# Device path (jittable): same matrices, f32 matmuls on the MXU
# ----------------------------------------------------------------------


def device_resize_fn(in_hw: Tuple[int, int], out_hw: Tuple[int, int], method: str = "bicubic"):
    """Return a jittable fn resizing NHWC batches from in_hw to out_hw.

    Weights are baked in as constants; the resize is two einsums that XLA
    maps to the MXU. float32 accumulation (vs. the host path's float64) —
    differences are ~1e-6, negligible for training, and the exact host path
    is used wherever reference parity is measured.
    """
    import jax.numpy as jnp

    mat_v = jnp.asarray(resample_matrix(in_hw[0], out_hw[0], method), dtype=jnp.float32)
    mat_h = jnp.asarray(resample_matrix(in_hw[1], out_hw[1], method), dtype=jnp.float32)

    import jax

    def resize(x):
        # x: [N, H, W, C] float. HIGHEST precision: TPU matmuls default to
        # bf16 passes, which is too coarse for resampling weights.
        x = jnp.einsum("oh,nhwc->nowc", mat_v, x.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST)
        x = jnp.einsum("pw,nhwc->nhpc", mat_h, x,
                       precision=jax.lax.Precision.HIGHEST)
        return x

    return resize
