"""Shared input-image builders (reference: helper/loader.py:23-67)."""

from __future__ import annotations

from typing import Tuple

import numpy as np

from dcscn_tpu.ops import color, patches
from dcscn_tpu.ops import resize as resize_ops
from dcscn_tpu.utils import imaging


def build_input_image(
    image: np.ndarray,
    width: int = 0,
    height: int = 0,
    channels: int = 1,
    scale: int = 1,
    alignment: int = 0,
    convert_ycbcr: bool = True,
) -> np.ndarray:
    """Center-crop / align / color-convert / downscale
    (reference: helper/loader.py:42-67)."""
    if width != 0 and height != 0:
        if image.shape[0] != height or image.shape[1] != width:
            x = (image.shape[1] - width) // 2
            y = (image.shape[0] - height) // 2
            image = image[y : y + height, x : x + width, :]

    if alignment > 1:
        image = patches.set_image_alignment(image, alignment)

    if channels == 1 and image.shape[2] == 3:
        if convert_ycbcr:
            image = color.convert_rgb_to_y(image)
    else:
        if convert_ycbcr:
            image = color.convert_rgb_to_ycbcr(image)

    if scale != 1:
        image = resize_ops.resize_image(image, 1.0 / scale)
    return image


def build_image_set(
    file_path: str,
    channels: int = 1,
    scale: int = 1,
    convert_ycbcr: bool = True,
    resampling_method: str = "bicubic",
    print_console: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(input LR, interpolated HR, true HR) triple for one file
    (reference: helper/loader.py:23-33)."""
    true_image = patches.set_image_alignment(
        imaging.load_image(file_path, print_console=print_console), scale
    )
    if channels == 1 and true_image.shape[2] == 3 and convert_ycbcr:
        true_image = color.convert_rgb_to_y(true_image)

    input_image = resize_ops.resize_image(true_image, 1.0 / scale, method=resampling_method)
    input_interpolated = resize_ops.resize_image(input_image, scale, method=resampling_method)
    return input_image, input_interpolated, true_image


def load_input_image(
    filename: str,
    width: int = 0,
    height: int = 0,
    channels: int = 1,
    scale: int = 1,
    alignment: int = 0,
    convert_ycbcr: bool = True,
    print_console: bool = True,
) -> np.ndarray:
    image = imaging.load_image(filename, print_console=print_console)
    return build_input_image(image, width, height, channels, scale, alignment, convert_ycbcr)
