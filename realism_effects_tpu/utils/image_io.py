"""Minimal image I/O (PNG via zlib, npy for HDR) — no external deps.

Replaces the reference's reliance on the browser for screenshots
(`example/main.js:748-755`) and `.png`/`.hdr` assets.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def tonemap_aces(rgb: np.ndarray) -> np.ndarray:
    """Cheap ACES-ish filmic curve for HDR -> display."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    x = np.maximum(rgb, 0.0)
    return np.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def linear_to_srgb(rgb: np.ndarray) -> np.ndarray:
    rgb = np.clip(rgb, 0.0, 1.0)
    return np.where(rgb <= 0.0031308, rgb * 12.92, 1.055 * rgb ** (1 / 2.4) - 0.055)


def write_png(path: str, image: np.ndarray, flip_v: bool = True):
    """Write an (H, W, 3|4) array to PNG.

    Accepts float in [0,1] or uint8. ``flip_v`` flips vertically because
    internal storage has row 0 at the bottom (GL convention).
    """
    img = np.asarray(image)
    if img.ndim == 2:
        img = img[..., None].repeat(3, axis=-1)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    if flip_v:
        img = img[::-1]
    h, w, c = img.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def save_frame(path: str, hdr_rgb, tonemap: bool = True):
    """Tonemap + sRGB-encode an HDR (H, W, 3) frame and write a PNG."""
    img = np.asarray(hdr_rgb, np.float32)
    if tonemap:
        img = tonemap_aces(img)
    write_png(path, linear_to_srgb(img))
