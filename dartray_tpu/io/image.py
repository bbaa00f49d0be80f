"""Image output: PNG (pure-python zlib writer) + PFM float dumps.

TPU-native replacement for the `image` package usage in the reference
(core/output_image.dart toImage gamma 2.2, spectrum_image.dart)."""
from __future__ import annotations

import struct
import zlib

import numpy as np

GAMMA = 2.2  # output_image.dart:57-66


def tonemap(rgb: np.ndarray, gamma: float = GAMMA) -> np.ndarray:
    """Linear RGB -> 8-bit sRGB-ish gamma (toImage semantics)."""
    x = np.clip(np.asarray(rgb, np.float64), 0.0, 1.0) ** (1.0 / gamma)
    return (x * 255.0 + 0.5).astype(np.uint8)


def write_png(path: str, rgb8: np.ndarray):
    """Minimal RGB8 PNG writer (no deps)."""
    h, w = rgb8.shape[:2]
    if rgb8.ndim == 2:
        rgb8 = np.repeat(rgb8[:, :, None], 3, axis=2)
    raw = b"".join(b"\x00" + rgb8[y].tobytes() for y in range(h))

    def chunk(tag, data):
        c = tag + data
        return (struct.pack(">I", len(data)) + c
                + struct.pack(">I", zlib.crc32(c) & 0xffffffff))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def write_pfm(path: str, rgb: np.ndarray):
    """Float HDR dump (PFM, little-endian)."""
    h, w = rgb.shape[:2]
    with open(path, "wb") as f:
        f.write(b"PF\n%d %d\n-1.0\n" % (w, h))
        f.write(np.asarray(rgb, np.float32)[::-1].tobytes())


def save(path: str, rgb_linear):
    rgb = np.asarray(rgb_linear)
    if path.endswith(".pfm"):
        write_pfm(path, rgb)
    else:
        write_png(path, tonemap(rgb))
