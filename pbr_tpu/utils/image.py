"""Image output: PNG/PPM writers and tone mapping.

The reference displayed via an OpenGL fullscreen-quad blit
(GLWidget.cpp:523-627); a headless TPU host writes files instead. Pure
Python + zlib — no external imaging deps.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def tonemap(rgb: np.ndarray, gamma: float = 2.2, exposure: float = 1.0) -> np.ndarray:
    """HDR float image → display u8: exposure scale, clamp, gamma.

    The reference wrote linear float straight to the texture (pt_rgb.cl) and
    let GL display it; for file output we apply standard gamma.
    """
    x = np.clip(np.asarray(rgb, dtype=np.float32) * exposure, 0.0, 1.0)
    x = np.power(x, 1.0 / gamma)
    return (x * 255.0 + 0.5).astype(np.uint8)


def write_png(path: str, img_u8: np.ndarray) -> None:
    """Write an (H, W, 3) uint8 array as a PNG file."""
    img_u8 = np.asarray(img_u8)
    if img_u8.ndim == 2:
        img_u8 = np.stack([img_u8] * 3, axis=-1)
    h, w, _ = img_u8.shape
    raw = b"".join(b"\x00" + img_u8[i].tobytes() for i in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def write_ppm(path: str, img_u8: np.ndarray) -> None:
    """Write an (H, W, 3) uint8 array as a binary PPM file."""
    img_u8 = np.asarray(img_u8)
    h, w, _ = img_u8.shape
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(img_u8.tobytes())


def save_render(path: str, rgb: np.ndarray, gamma: float = 2.2, exposure: float = 1.0) -> None:
    write_png(path, tonemap(rgb, gamma=gamma, exposure=exposure))
