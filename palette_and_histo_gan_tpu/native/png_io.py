"""ctypes bindings for the native PNG decoder (png_decode.cpp).

All entry points return None / raise gracefully when the shared library has
not been built, letting callers fall back to PIL.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libphg_png.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.phg_decode_png_file.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_long,
        ctypes.c_long,
    ]
    lib.phg_decode_png_file.restype = ctypes.c_int
    lib.phg_decode_folder.argtypes = [
        ctypes.c_char_p,
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.phg_decode_folder.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode_png_rgba(path: str, h: int = 64, w: int = 64) -> np.ndarray | None:
    """Decode one PNG to (h, w, 4) uint8; None if the library is missing or
    the file is an unsupported format (caller falls back to PIL)."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((h, w, 4), dtype=np.uint8)
    rc = lib.phg_decode_png_file(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w
    )
    if rc != 0:
        return None
    return out


def decode_folder(folder: str, n: int, h: int = 64, w: int = 64, start: int = 0):
    """Decode <folder>/<start+i>.png for i in [0, n) in one native call.

    Returns (n, h, w, 4) uint8 or None on failure.
    """
    lib = _load()
    if lib is None:
        return None
    out = np.empty((n, h, w, 4), dtype=np.uint8)
    rc = lib.phg_decode_folder(
        folder.encode(), start, n, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        return None
    return out
