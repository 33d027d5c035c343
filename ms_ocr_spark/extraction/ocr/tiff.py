"""Minimal deterministic baseline TIFF codec (8-bit grayscale), stdlib+numpy.

The reference's upload allow-list ends with tif/tiff
(`/root/reference/env/local.env:25`) and decodes with PIL
(`src/library/image_processor/main.py:58-63`).  This sandbox has no
PIL/OpenCV, so TIFF media in the synthetic corpus are real baseline
TIFF 6.0 bytes produced/consumed by this codec.

Scope (documented, honest):
  * encode: little-endian, single-sample gray8, BlackIsZero,
    uncompressed, MULTI-STRIP (strips keep readers streaming-friendly
    and mirror what scanners emit), optional X/Y resolution (dpi).
  * decode: either endianness, first IFD, gray8 single-sample,
    Compression 1 (none) or 32773 (PackBits RLE), Photometric 0
    (WhiteIsZero -> inverted on load) or 1, any strip layout.
Anything else (LZW, tiled, multi-sample, 1/4/16-bit) raises ValueError —
the pipeline quarantines such rows, the same admission-reject behavior
the reference applies to bad uploads (`src/controller/Upload.ts:22-32`).
"""

from __future__ import annotations

import struct

import numpy as np

# tag ids (TIFF 6.0 baseline)
_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_XRES = 282
_T_YRES = 283
_T_RES_UNIT = 296

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


def encode_gray_tiff(
    img: np.ndarray, dpi: float | None = None, rows_per_strip: int = 64
) -> bytes:
    """Gray8 ndarray -> little-endian uncompressed multi-strip TIFF."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("encode_gray_tiff expects a 2-D uint8 array")
    h, w = img.shape
    rows_per_strip = max(1, min(rows_per_strip, h))
    strips = [
        img[y : y + rows_per_strip].tobytes() for y in range(0, h, rows_per_strip)
    ]

    tags: list[tuple[int, int, int, int]] = []  # (tag, type, count, value)
    extra = b""  # out-of-line values, appended after the IFD

    def _entry(tag: int, typ: int, count: int, value: int) -> None:
        tags.append((tag, typ, count, value))

    # layout: header(8) | strip data | IFD | out-of-line values
    data_off = 8
    strip_offsets = []
    off = data_off
    for s in strips:
        strip_offsets.append(off)
        off += len(s)
    ifd_off = off

    n_entries = 9 + (3 if dpi else 0)
    ifd_size = 2 + n_entries * 12 + 4
    extra_off = ifd_off + ifd_size

    def _arr_value(values: list[int], typ: int) -> int:
        """Return the IFD value slot for a LONG/SHORT array: inline when
        it fits in 4 bytes, else an offset into the out-of-line area."""
        nonlocal extra
        size = _TYPE_SIZES[typ] * len(values)
        fmt = {3: "H", 4: "I"}[typ]
        packed = struct.pack("<" + fmt * len(values), *values)
        if size <= 4:
            return int.from_bytes(packed.ljust(4, b"\0"), "little")
        slot = extra_off + len(extra)
        extra += packed
        return slot

    def _rational(v: float) -> int:
        nonlocal extra
        slot = extra_off + len(extra)
        extra += struct.pack("<II", int(round(v)), 1)
        return slot

    _entry(_T_WIDTH, 4, 1, w)
    _entry(_T_HEIGHT, 4, 1, h)
    _entry(_T_BITS, 3, 1, 8)
    _entry(_T_COMPRESSION, 3, 1, 1)
    _entry(_T_PHOTOMETRIC, 3, 1, 1)  # BlackIsZero
    _entry(_T_STRIP_OFFSETS, 4, len(strips), _arr_value(strip_offsets, 4))
    _entry(_T_SAMPLES, 3, 1, 1)
    _entry(_T_ROWS_PER_STRIP, 4, 1, rows_per_strip)
    _entry(_T_STRIP_COUNTS, 4, len(strips), _arr_value([len(s) for s in strips], 4))
    if dpi:
        _entry(_T_XRES, 5, 1, _rational(dpi))
        _entry(_T_YRES, 5, 1, _rational(dpi))
        _entry(_T_RES_UNIT, 3, 1, 2)  # inch

    out = [struct.pack("<2sHI", b"II", 42, ifd_off)]
    out.extend(strips)
    ifd = [struct.pack("<H", n_entries)]
    for tag, typ, count, value in sorted(tags):  # TIFF requires ascending tags
        ifd.append(struct.pack("<HHII", tag, typ, count, value))
    ifd.append(struct.pack("<I", 0))  # no next IFD
    out.append(b"".join(ifd))
    out.append(extra)
    return b"".join(out)


def _unpackbits(data: bytes, expected: int) -> bytes:
    """Apple PackBits RLE (TIFF 6.0 §9): n in [0,127] -> copy n+1 literal
    bytes; n in [-127,-1] -> repeat next byte 1-n times; -128 is a noop."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([data[i]]) * (257 - n)
            i += 1
    if len(out) < expected:
        raise ValueError("truncated PackBits strip")
    return bytes(out[:expected])


def _read_ifd(data: bytes, e: str, off: int) -> dict[int, list[int]]:
    (n,) = struct.unpack_from(e + "H", data, off)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        tag, typ, count = struct.unpack_from(e + "HHI", data, off + 2 + i * 12)
        if typ not in _TYPE_SIZES:
            continue
        size = _TYPE_SIZES[typ] * count
        voff = off + 2 + i * 12 + 8
        if size > 4:
            (voff,) = struct.unpack_from(e + "I", data, voff)
        if typ == 3:
            vals = list(struct.unpack_from(e + "H" * count, data, voff))
        elif typ == 4:
            vals = list(struct.unpack_from(e + "I" * count, data, voff))
        elif typ == 5:
            raw = struct.unpack_from(e + "II" * count, data, voff)
            vals = [raw[2 * k] // max(raw[2 * k + 1], 1) for k in range(count)]
        elif typ == 1:
            vals = list(data[voff : voff + count])
        else:
            continue
        tags[tag] = vals
    return tags


def _parse(data: bytes) -> tuple[dict[int, list[int]], str]:
    if data[:4] == b"II*\0":
        e = "<"
    elif data[:4] == b"MM\0*":
        e = ">"
    else:
        raise ValueError("not a TIFF")
    (ifd_off,) = struct.unpack_from(e + "I", data, 4)
    return _read_ifd(data, e, ifd_off), e


def decode_gray_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes -> gray8 ndarray (first IFD; see module scope).

    Malformed structure (truncated IFD, offsets past EOF) surfaces as
    ValueError so the pipeline's quarantine catch treats codec and
    structure failures uniformly."""
    try:
        tags, _ = _parse(data)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed TIFF: {exc}") from exc
    try:
        w, h = tags[_T_WIDTH][0], tags[_T_HEIGHT][0]
        offsets, counts = tags[_T_STRIP_OFFSETS], tags[_T_STRIP_COUNTS]
    except KeyError as exc:
        raise ValueError(f"TIFF missing baseline tag {exc}") from exc
    bits = tags.get(_T_BITS, [1])[0]
    samples = tags.get(_T_SAMPLES, [1])[0]
    compression = tags.get(_T_COMPRESSION, [1])[0]
    photometric = tags.get(_T_PHOTOMETRIC, [1])[0]
    if bits != 8 or samples != 1:
        raise ValueError(f"unsupported TIFF sample layout: {bits}-bit x{samples}")
    if compression not in (1, 32773):
        raise ValueError(f"unsupported TIFF compression {compression}")
    if photometric not in (0, 1):
        raise ValueError(f"unsupported TIFF photometric {photometric}")
    rows_per_strip = tags.get(_T_ROWS_PER_STRIP, [h])[0]
    raw = bytearray()
    for si, (so, sc) in enumerate(zip(offsets, counts)):
        strip = bytes(data[so : so + sc])
        n_rows = min(rows_per_strip, h - si * rows_per_strip)
        if compression == 32773:
            strip = _unpackbits(strip, n_rows * w)
        elif len(strip) < n_rows * w:
            raise ValueError("truncated TIFF strip")
        raw += strip[: n_rows * w]
    img = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, w)
    if photometric == 0:  # WhiteIsZero
        img = 255 - img
    return img


def tiff_dpi(data: bytes) -> float | None:
    """X-resolution in dots/inch when present with inch units, else None
    (metadata side-channel parity with `jpeg.jfif_density`)."""
    try:
        tags, _ = _parse(data)
    except (ValueError, struct.error, IndexError):
        return None
    if _T_XRES not in tags:
        return None
    unit = tags.get(_T_RES_UNIT, [2])[0]
    if unit == 2:
        return float(tags[_T_XRES][0])
    if unit == 3:  # dots/cm
        return float(tags[_T_XRES][0]) * 2.54
    return None
