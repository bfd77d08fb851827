"""ctypes bindings for the native runtime tier (csrc/libpt_native.so).

The reference's host runtime (PNG encode, byte-space post filters) is
native Go; this framework's equivalent tier is C++ behind a plain C ABI
(pybind11 is not in the image).  Everything here is optional: callers fall
back to PIL/jnp implementations when the library is absent, and the build
is one ``make -C csrc``.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

__all__ = ["lib", "available", "encode_png", "bilateral3x3", "box_smooth"]

_LIB_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "libpt_native.so"),
    os.path.join(os.path.dirname(__file__), "libpt_native.so"),
)

lib: Optional[ctypes.CDLL] = None
for _p in _LIB_PATHS:
    if os.path.exists(_p):
        try:
            lib = ctypes.CDLL(os.path.abspath(_p))
            break
        except OSError:
            lib = None

if lib is not None:
    lib.pt_encode_png.restype = ctypes.c_int64
    lib.pt_encode_png.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
    ]
    lib.pt_bilateral3x3.restype = None
    lib.pt_bilateral3x3.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_double,
        ctypes.c_double,
    ]
    lib.pt_box_smooth.restype = None
    lib.pt_box_smooth.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_double,
    ]


def available() -> bool:
    return lib is not None


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def encode_png(img: np.ndarray, compress_level: int = 6) -> Optional[bytes]:
    """Encode RGB(A) uint8 [H,W,C] to PNG bytes; None if unavailable/failed."""
    if lib is None:
        return None
    img = np.ascontiguousarray(img)
    h, w, c = img.shape
    cap = w * h * c + (h * 16) + 4096
    out = np.empty(cap, np.uint8)
    n = lib.pt_encode_png(_u8ptr(img), w, h, c, compress_level, _u8ptr(out), cap)
    if n <= 0:
        return None
    return out[:n].tobytes()


def bilateral3x3(img: np.ndarray, sigma_s: float, sigma_r: float) -> Optional[np.ndarray]:
    if lib is None:
        return None
    img = np.ascontiguousarray(img)
    h, w, c = img.shape
    dst = np.empty_like(img)
    lib.pt_bilateral3x3(_u8ptr(img), _u8ptr(dst), w, h, c, sigma_s, sigma_r)
    return dst


def box_smooth(img: np.ndarray, radius: int, strength: float) -> Optional[np.ndarray]:
    if lib is None:
        return None
    img = np.ascontiguousarray(img)
    h, w, c = img.shape
    dst = np.empty_like(img)
    lib.pt_box_smooth(_u8ptr(img), _u8ptr(dst), w, h, c, radius, strength)
    return dst
