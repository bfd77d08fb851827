"""PNG output (engine.SavePNG analog, util.go:45-55).

Encoder preference: the native C++ tier (csrc/pt_native.cpp via ctypes —
per-row filter selection + zlib), then PIL, then a minimal dependency-free
zlib fallback, so the framework stays standalone everywhere.
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Union

import numpy as np

__all__ = ["save_png"]


def save_png(path: Union[str, os.PathLike], img: np.ndarray) -> None:
    """Write an RGB(A) uint8 image [H,W,3|4] to ``path`` as PNG."""
    img = np.ascontiguousarray(np.asarray(img))
    if img.dtype != np.uint8:
        raise TypeError(f"save_png expects uint8, got {img.dtype}")
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError(f"save_png expects [H,W,3|4], got {img.shape}")
    from .utils import native

    data = native.encode_png(img)
    if data is not None:
        with open(os.fspath(path), "wb") as f:
            f.write(data)
        return
    try:
        from PIL import Image

        Image.fromarray(img).save(os.fspath(path))
        return
    except ImportError:
        pass
    _write_png_fallback(os.fspath(path), img)


def _write_png_fallback(path: str, img: np.ndarray) -> None:
    h, w, ch = img.shape
    color_type = 2 if ch == 3 else 6

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 (None) per scanline
    raw = np.concatenate([np.zeros((h, 1), np.uint8), img.reshape(h, w * ch)], axis=1)
    idat = zlib.compress(raw.tobytes(), 6)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", idat))
        f.write(chunk(b"IEND", b""))
