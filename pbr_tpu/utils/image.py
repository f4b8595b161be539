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


def read_png(path: str) -> np.ndarray:
    """Read a PNG written by ``write_png`` back to (H, W, 3) uint8.

    Supports exactly the subset write_png emits (8-bit RGB, filter 0) —
    enough for round-trip tests without an imaging dependency.
    """
    with open(path, "rb") as f:
        data = f.read()
    # Real errors, not asserts (ADVICE r4: asserts vanish under python -O
    # and malformed input would then misparse silently).
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError(f"read_png: {path!r} is not a PNG")
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if (depth, ctype) != (8, 2):
                raise ValueError(
                    f"read_png: only 8-bit RGB supported, got depth={depth} "
                    f"color-type={ctype}"
                )
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + ln
    if w is None:
        raise ValueError("read_png: missing IHDR chunk")
    raw = zlib.decompress(idat)
    stride = 1 + 3 * w
    if len(raw) < h * stride:
        raise ValueError("read_png: truncated IDAT payload")
    rows = []
    for i in range(h):
        line = raw[i * stride : (i + 1) * stride]
        if line[0] != 0:
            raise ValueError(
                f"read_png: only filter 0 supported (write_png's output), "
                f"row {i} uses filter {line[0]}"
            )
        rows.append(np.frombuffer(line[1:], dtype=np.uint8).reshape(w, 3))
    return np.stack(rows)


def write_ppm(path: str, img_u8: np.ndarray) -> None:
    """Write an (H, W, 3) uint8 array as a binary PPM file."""
    img_u8 = np.asarray(img_u8)
    h, w, _ = img_u8.shape
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(img_u8.tobytes())


def save_render(path: str, rgb: np.ndarray, gamma: float = 2.2, exposure: float = 1.0) -> None:
    write_png(path, tonemap(rgb, gamma=gamma, exposure=exposure))
