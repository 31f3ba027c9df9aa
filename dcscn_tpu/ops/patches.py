"""Patch extraction and image alignment.

Host-side equivalents of the reference's stride-tricks patchifier and
alignment crop (helper/utilty.py:196-208, :286-345), vectorized with
numpy sliding_window_view.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


def set_image_alignment(image: np.ndarray, alignment: int) -> np.ndarray:
    """Crop H and W down to multiples of `alignment`; drop alpha
    (reference: helper/utilty.py:196-208)."""
    alignment = int(alignment)
    width, height = image.shape[1], image.shape[0]
    width = (width // alignment) * alignment
    height = (height // alignment) * alignment
    if image.shape[1] != width or image.shape[0] != height:
        image = image[:height, :width, :]
    if image.ndim >= 3 and image.shape[2] >= 4:
        image = image[:, :, 0:3]
    return image


def get_split_images(
    image: np.ndarray,
    window_size: int,
    stride: Optional[int] = None,
    enable_duplicate: bool = False,
) -> Optional[np.ndarray]:
    """Split a (H, W[, 1]) image into [N, win, win, 1] patches on a grid
    (reference: helper/utilty.py:286-327). Returns None when the image is
    smaller than the window."""
    if image.ndim == 3 and image.shape[2] == 1:
        image = image.reshape(image.shape[0], image.shape[1])

    window_size = int(window_size)
    height, width = image.shape
    stride = window_size if stride is None else int(stride)

    if height < window_size or width < window_size:
        return None

    views = np.lib.stride_tricks.sliding_window_view(image, (window_size, window_size))
    windows = views[::stride, ::stride].reshape(-1, window_size, window_size, 1)

    if enable_duplicate:
        extra = []
        if (height - window_size) % stride != 0:
            for x in range(0, width - window_size, stride):
                extra.append(image[height - window_size - 1 : height - 1, x : x + window_size])
        if (width - window_size) % stride != 0:
            for y in range(0, height - window_size, stride):
                extra.append(image[y : y + window_size, width - window_size - 1 : width - 1])
        if extra:
            extra_arr = np.stack(extra)[..., None]
            windows = np.concatenate([windows, extra_arr], axis=0)

    return np.ascontiguousarray(windows)


def get_divided_images(
    image: np.ndarray, window_size: int, stride: int, min_size: int = 0
) -> List[np.ndarray]:
    """Divide an image with a given stride; edge tiles may be smaller
    (reference: helper/utilty.py:331-345)."""
    h, w = image.shape[:2]
    divided = []
    for y in range(0, h, stride):
        for x in range(0, w, stride):
            new_h = window_size if y + window_size <= h else h - y
            new_w = window_size if x + window_size <= w else w - x
            if new_h < min_size or new_w < min_size:
                continue
            divided.append(image[y : y + new_h, x : x + new_w, :])
    return divided
