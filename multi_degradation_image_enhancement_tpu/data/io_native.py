"""ctypes bindings for the native host-IO engine (native/mdie_io.cpp).

The per-image decode loop of the data layer runs in C++ (libjpeg/libpng +
fused resize/letterbox into the pre-allocated batch buffer, optional thread
fan-out) instead of Python PIL — the TPU-native replacement for the
reference's forked DataLoader workers (``utils/parser.py:98-104``).

Builds on demand with the system toolchain; every caller falls back to PIL
when the library is unavailable (set ``MDIE_NATIVE_IO=0`` to force the
fallback).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libmdie_io.so")

MODE_EXACT = 0
MODE_RESIZE = 1
MODE_LETTERBOX = 2

_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if os.environ.get("MDIE_NATIVE_IO", "1") == "0":
        _lib_failed = True
        return None
    try:
        cpp = os.path.join(_NATIVE_DIR, "mdie_io.cpp")
        stale = os.path.isfile(_SO_PATH) and os.path.isfile(cpp) and (
            os.path.getmtime(cpp) > os.path.getmtime(_SO_PATH)
        )
        if not os.path.isfile(_SO_PATH) or stale:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR] + (["-B"] if stale else []), check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
        lib = ctypes.CDLL(_SO_PATH)
        lib.mdie_decode_image.restype = ctypes.c_int
        lib.mdie_decode_image.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.mdie_decode_batch.restype = ctypes.c_int
        lib.mdie_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.mdie_encode_png.restype = ctypes.c_int
        lib.mdie_encode_png.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.mdie_encode_png_batch.restype = ctypes.c_int
        lib.mdie_encode_png_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        _lib = lib
    except Exception:
        _lib_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def decode_image(path: str, target_h: int, target_w: int, mode: int = MODE_RESIZE) -> Optional[np.ndarray]:
    """Decode one image to uint8 RGB [target_h, target_w, 3]; None on failure."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((target_h, target_w, 3), np.uint8)
    rc = lib.mdie_decode_image(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        target_h, target_w, mode,
    )
    return out if rc == 0 else None


def decode_batch(
    paths: List[str], target_h: int, target_w: int,
    mode: int = MODE_RESIZE, n_threads: int = 4,
) -> Optional[np.ndarray]:
    """Decode a batch into one [N, th, tw, 3] uint8 buffer; None if lib missing.

    Failed files decode as zeros (count reported via the return code of the
    C call; callers treat zero-images as degenerate samples, matching the
    reference's skip-on-unreadable behavior in spirit).
    """
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, target_h, target_w, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.mdie_decode_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        target_h, target_w, mode, n_threads,
    )
    return out


def encode_png(path: str, img_u8: np.ndarray, compress_level: int = 1) -> bool:
    """Write one RGB uint8 [H, W, 3] array as PNG via libpng; False if the
    native library is unavailable or the write failed (callers fall back to
    PIL)."""
    lib = _load()
    if lib is None or not hasattr(lib, "mdie_encode_png"):
        return False
    img_u8 = np.ascontiguousarray(img_u8, dtype=np.uint8)
    h, w, c = img_u8.shape
    if c != 3:
        return False
    rc = lib.mdie_encode_png(
        path.encode(), img_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, compress_level,
    )
    return rc == 0


def encode_png_batch(
    paths: List[str], imgs_u8: np.ndarray, compress_level: int = 1, n_threads: int = 4
) -> Optional[int]:
    """Write a [N, H, W, 3] uint8 batch to per-image PNG paths with the
    engine's thread fan-out.  Returns the failure count, or None if the
    native library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "mdie_encode_png_batch"):
        return None
    imgs_u8 = np.ascontiguousarray(imgs_u8, dtype=np.uint8)
    n, h, w, c = imgs_u8.shape
    if c != 3 or n != len(paths):
        return None
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    return int(
        lib.mdie_encode_png_batch(
            arr, imgs_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, h, w, compress_level, n_threads,
        )
    )
