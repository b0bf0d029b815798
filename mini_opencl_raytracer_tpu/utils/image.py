"""Image output: PNG / NumPy / PFM.

Replaces the reference's display path (GL texture upload + fullscreen
quad, CLRaytracer.cpp:63-81) with headless file output, per SURVEY.md
section 5 ('PNG/EXR image dump replaces the GL window'). PFM covers the
HDR (linear radiance) use case without an OpenEXR dependency.
"""

from __future__ import annotations

import numpy as np


def to_uint8(image) -> np.ndarray:
    """[H, W, 3] float (gamma-encoded, [0,1]-ish) -> uint8, clipped."""
    arr = np.asarray(image)
    return (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def write_png(path: str, image) -> str:
    """Write a gamma-encoded [H, W, 3] image as PNG (PIL if available,
    else a minimal pure-Python PNG encoder)."""
    arr = to_uint8(image)
    try:
        from PIL import Image
        Image.fromarray(arr).save(path)
        return path
    except ImportError:
        _write_png_pure(path, arr)
        return path


def _write_png_pure(path: str, arr: np.ndarray) -> None:
    """Minimal RGB8 PNG writer (zlib + struct only)."""
    import struct
    import zlib

    h, w = arr.shape[:2]

    def chunk(tag: bytes, data: bytes) -> bytes:
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw, 6))
           + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def write_pfm(path: str, image) -> str:
    """Write linear radiance as PFM (portable float map, HDR)."""
    arr = np.asarray(image, np.float32)
    h, w = arr.shape[:2]
    with open(path, "wb") as f:
        f.write(b"PF\n")
        f.write(f"{w} {h}\n".encode())
        f.write(b"-1.0\n")  # little-endian
        # PFM stores bottom-to-top.
        f.write(arr[::-1].tobytes())
    return path


def write_npy(path: str, image) -> str:
    np.save(path, np.asarray(image))
    return path
