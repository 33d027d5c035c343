"""Minimal deterministic PNG codec (8-bit grayscale), stdlib only.

The reference accepts jpg/png/tif uploads and decodes them with PIL
(`/root/reference/src/library/image_processor/main.py:58-63`).  This
sandbox has no PIL/OpenCV, so media payloads in the synthetic corpus are
real PNG bytes produced/consumed by this ~120-line pure-Python codec
(zlib + struct).  Encode always writes filter type 0; decode handles all
five standard filter types so any conforming grayscale-8 PNG is readable.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_gray(img: np.ndarray) -> bytes:
    """uint8 HxW array -> PNG bytes (color type 0, bit depth 8)."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("encode_gray expects a 2-D uint8 array")
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    # filter byte 0 per scanline
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_gray(data: bytes) -> np.ndarray:
    """PNG bytes (grayscale-8) -> uint8 HxW array."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 0:
                raise ValueError(f"unsupported PNG: depth={depth} ctype={ctype}")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width + 1
    out = np.zeros((height, width), dtype=np.uint8)
    prev = np.zeros(width, dtype=np.int64)
    for r in range(height):
        row = raw[r * stride : (r + 1) * stride]
        ftype = row[0]
        line = np.frombuffer(row[1:], dtype=np.uint8).astype(np.int64)
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(1, width):
                cur[x] = (cur[x] + cur[x - 1]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            cur[0] = (cur[0] + prev[0] // 2) & 0xFF
            for x in range(1, width):
                cur[x] = (cur[x] + (cur[x - 1] + prev[x]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            cur[0] = (cur[0] + _paeth(0, int(prev[0]), 0)) & 0xFF
            for x in range(1, width):
                cur[x] = (cur[x] + _paeth(int(cur[x - 1]), int(prev[x]), int(prev[x - 1]))) & 0xFF
        else:
            raise ValueError(f"bad filter {ftype}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return out
