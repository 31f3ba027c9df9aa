"""Image file I/O (reference: helper/utilty.py:113-139, :242-266)."""

from __future__ import annotations

import os

import imageio.v2 as imageio
import numpy as np
from PIL import Image


class LoadError(Exception):
    def __init__(self, message):
        super().__init__(message)
        self.message = message


def load_image(
    filename: str,
    width: int = 0,
    height: int = 0,
    channels: int = 0,
    alignment: int = 0,
    print_console: bool = True,
) -> np.ndarray:
    """Load an image as (H, W, C) uint8, dropping alpha
    (reference: helper/utilty.py:242-266)."""
    if not os.path.isfile(filename):
        raise LoadError("File not found [%s]" % filename)

    image = np.atleast_3d(imageio.imread(filename))

    if (width != 0 and image.shape[1] != width) or (height != 0 and image.shape[0] != height):
        raise LoadError("Attributes mismatch")
    if channels != 0 and image.shape[2] != channels:
        raise LoadError("Attributes mismatch")
    if alignment != 0 and ((image.shape[1] % alignment) != 0 or (image.shape[0] % alignment) != 0):
        raise LoadError("Attributes mismatch")

    if image.shape[2] >= 4:
        image = image[:, :, 0:3]
    elif image.shape[2] == 2:  # gray+alpha (LA): keep luminance — a 2-ch
        image = image[:, :, 0:1]  # array crashes every downstream path

    if print_console:
        print("Loaded [%s]: %d x %d x %d" % (filename, image.shape[1], image.shape[0], image.shape[2]))
    return image


def save_image(filename: str, image: np.ndarray, print_console: bool = True) -> None:
    """Save (H, W[, C]) image data as uint8 (reference: helper/utilty.py:113-130)."""
    if image.ndim >= 3 and image.shape[2] == 1:
        image = image.reshape(image.shape[0], image.shape[1])

    directory = os.path.dirname(filename)
    image = image.astype(np.uint8)
    if directory != "" and not os.path.exists(directory):
        os.makedirs(directory, exist_ok=True)

    if image.ndim >= 3 and image.shape[2] == 3:
        pil = Image.fromarray(image, mode="RGB")
    else:
        pil = Image.fromarray(image)
    imageio.imwrite(filename, np.array(pil))

    if print_console:
        print("Saved [%s]" % filename)


def load_image_data(
    filename: str,
    width: int = 0,
    height: int = 0,
    channels: int = 0,
    alignment: int = 0,
    print_console: bool = True,
) -> np.ndarray:
    """Load raw .npy image data (reference: helper/utilty.py:269-283)."""
    if not os.path.isfile(filename):
        raise LoadError("File not found")
    image = np.load(filename)
    if (width != 0 and image.shape[1] != width) or (height != 0 and image.shape[0] != height):
        raise LoadError("Attributes mismatch")
    if channels != 0 and image.shape[2] != channels:
        raise LoadError("Attributes mismatch")
    if alignment != 0 and ((image.shape[1] % alignment) != 0 or (image.shape[0] % alignment) != 0):
        raise LoadError("Attributes mismatch")
    if print_console:
        print("Loaded [%s]: %d x %d x %d" % (filename, image.shape[1], image.shape[0], image.shape[2]))
    return image


def save_image_data(filename: str, image: np.ndarray) -> None:
    directory = os.path.dirname(filename)
    if directory != "" and not os.path.exists(directory):
        os.makedirs(directory, exist_ok=True)
    np.save(filename, image)
    print("Saved [%s]" % filename)
