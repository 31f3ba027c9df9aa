"""ctypes bindings for the native data-path library (native/dcscn_io.cpp).

Auto-builds `native/libdcscn_io.so` with make on first use when a compiler
is available; every entry point has a numpy fallback so the framework works
without the native library (and tests assert native == numpy).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libdcscn_io.so"))

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.isfile(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR), "-s"],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.extract_patches_u8.restype = ctypes.c_int64
    lib.extract_patches_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
    ]
    lib.rgb_to_y_f32.restype = None
    lib.rgb_to_y_f32.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.write_bmp_gray8.restype = ctypes.c_int
    lib.write_bmp_gray8.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.c_int64,
    ]
    lib.read_bmp_gray8.restype = ctypes.c_int
    lib.read_bmp_gray8.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.write_bmp_batch.restype = ctypes.c_int64
    lib.write_bmp_batch.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
    ]
    lib.read_bmp_batch.restype = ctypes.c_int64
    lib.read_bmp_batch.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.c_int64,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _u8ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def extract_patches(img: np.ndarray, win: int, stride: int) -> Optional[np.ndarray]:
    """[H, W] uint8 -> [N, win, win, 1] uint8 grid patches (native when
    available, numpy fallback). Same grid as ops.patches.get_split_images."""
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    if h < win or w < win:
        return None
    lib = _load()
    if lib is None:
        from dcscn_tpu.ops import patches as patches_ops

        return patches_ops.get_split_images(img, win, stride=stride)
    ny = 1 + (h - win) // stride
    nx = 1 + (w - win) // stride
    out = np.empty((ny * nx, win, win), np.uint8)
    n = lib.extract_patches_u8(_u8ptr(img), h, w, win, stride, _u8ptr(out), out.size)
    if n < 0:
        return None
    return out.reshape(n, win, win, 1)


def rgb_to_y(rgb: np.ndarray) -> np.ndarray:
    """[H, W, 3] uint8 -> [H, W, 1] float32 Y (BT.601)."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    lib = _load()
    if lib is None:
        from dcscn_tpu.ops import color

        return color.convert_rgb_to_y(rgb).astype(np.float32)
    h, w = rgb.shape[:2]
    out = np.empty((h, w), np.float32)
    lib.rgb_to_y_f32(_u8ptr(rgb), h * w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out.reshape(h, w, 1)


def write_bmp(path: str, img: np.ndarray) -> bool:
    if img.ndim == 3:
        img = img[:, :, 0]
    img = np.ascontiguousarray(img, dtype=np.uint8)
    lib = _load()
    if lib is None:
        from dcscn_tpu.utils import imaging

        imaging.save_image(path, img, print_console=False)
        return True
    return lib.write_bmp_gray8(path.encode(), _u8ptr(img), img.shape[1], img.shape[0]) == 0


def read_bmp(path: str) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        from dcscn_tpu.utils import imaging

        img = imaging.load_image(path, print_console=False)
        return img[:, :, 0] if img.ndim == 3 else img
    w = ctypes.c_int64()
    h = ctypes.c_int64()
    rc = lib.read_bmp_gray8(path.encode(), None, 0, ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    out = np.empty((h.value, w.value), np.uint8)
    rc = lib.read_bmp_gray8(path.encode(), _u8ptr(out), out.size,
                            ctypes.byref(w), ctypes.byref(h))
    return out if rc == 0 else None


def write_bmp_batch(directory: str, patches: np.ndarray, start_index: int = 0) -> int:
    """[N, win, win(, 1)] uint8 -> dir/%06d.bmp, parallel. Returns count."""
    if patches.ndim == 4:
        patches = patches[:, :, :, 0]
    patches = np.ascontiguousarray(patches, dtype=np.uint8)
    lib = _load()
    if lib is None:
        from dcscn_tpu.utils import imaging

        for i in range(patches.shape[0]):
            imaging.save_image(os.path.join(directory, "%06d.bmp" % (start_index + i)),
                               patches[i], print_console=False)
        return patches.shape[0]
    n, win, _ = patches.shape
    return int(lib.write_bmp_batch(directory.encode(), _u8ptr(patches), n, win,
                                   start_index))


def read_bmp_batch(directory: str, count: int, win: int) -> Optional[np.ndarray]:
    """dir/%06d.bmp x count -> [count, win, win, 1] uint8, parallel."""
    lib = _load()
    if lib is None:
        from dcscn_tpu.utils import imaging

        out = np.empty((count, win, win, 1), np.uint8)
        for i in range(count):
            img = imaging.load_image(os.path.join(directory, "%06d.bmp" % i),
                                     print_console=False)
            out[i] = img.reshape(win, win, 1)
        return out
    out = np.empty((count, win, win), np.uint8)
    ok = lib.read_bmp_batch(directory.encode(), _u8ptr(out), count, win)
    if ok != count:
        return None
    return out[..., None]
