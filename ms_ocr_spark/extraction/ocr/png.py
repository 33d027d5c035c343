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


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass
# (PNG spec 4.5.2 — round 6, VERDICT r5 item 8)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _adam7_dims(w: int, h: int) -> list[tuple[int, int]]:
    """(pass_w, pass_h) for each of the 7 passes; empty passes are
    (0, _) or (_, 0) and contribute no scanlines."""
    return [
        ((w - x0 + dx - 1) // dx, (h - y0 + dy - 1) // dy)
        for x0, y0, dx, dy in _ADAM7
    ]


def encode_gray(
    img: np.ndarray,
    dpi: float | None = None,
    icc: tuple[str, bytes] | None = None,
    exif_orientation: int | None = None,
    interlace: bool = False,
) -> bytes:
    """uint8 HxW array -> PNG bytes (color type 0, bit depth 8;
    `interlace=True` writes the seven Adam7 sub-images, round 6).

    Optional ancillary side-values mirror what the reference keeps at
    decode (`image_processor/main.py:58-63` returns (ndarray, icc, exif)):
    `dpi` -> pHYs, `icc` = (profile name, profile bytes) -> iCCP,
    `exif_orientation` -> eXIf with a minimal little-endian TIFF IFD.
    """
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("encode_gray expects a 2-D uint8 array")
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 1 if interlace else 0)
    side = b""
    if icc is not None:
        name, profile = icc
        side += _chunk(b"iCCP", name.encode("latin-1") + b"\x00\x00" + zlib.compress(profile))
    if dpi is not None:
        ppm = round(dpi / 0.0254)
        side += _chunk(b"pHYs", struct.pack(">IIB", ppm, ppm, 1))
    if exif_orientation is not None:
        # minimal valid TIFF: LE header -> one IFD with the Orientation
        # (0x0112) SHORT tag, zero next-IFD pointer
        tiff = (
            b"II*\x00\x08\x00\x00\x00"
            + struct.pack("<H", 1)
            + struct.pack("<HHI", 0x0112, 3, 1)
            + struct.pack("<HH", exif_orientation, 0)
            + struct.pack("<I", 0)
        )
        side += _chunk(b"eXIf", tiff)
    if interlace:
        # seven filter-0 sub-images, in pass order, empty passes skipped
        raw = b"".join(
            b"\x00" + img[y0 + r * dy, x0::dx].tobytes()
            for (x0, y0, dx, dy), (pw, ph) in zip(_ADAM7, _adam7_dims(w, h))
            if pw and ph
            for r in range(ph)
        )
    else:
        # filter byte 0 per scanline
        raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + side
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def side_values(data: bytes) -> dict:
    """Parse the ancillary side-values (dpi, ICC, EXIF orientation) this
    codec writes; unknown/absent chunks yield None fields.  Keeps parity
    with the reference's decode contract (S5 keeps icc/exif)."""
    out: dict = {"dpi": None, "icc_name": None, "icc_profile": None, "orientation": None}
    if data[:8] != _SIGNATURE:
        return out
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"pHYs" and len(payload) == 9:
            ppm_x, _, unit = struct.unpack(">IIB", payload)
            if unit == 1:
                out["dpi"] = round(ppm_x * 0.0254, 4)
        elif tag == b"iCCP":
            nul = payload.index(b"\x00")
            out["icc_name"] = payload[:nul].decode("latin-1")
            out["icc_profile"] = zlib.decompress(payload[nul + 2 :])
        elif tag == b"eXIf" and payload[:4] in (b"II*\x00", b"MM\x00*"):
            if payload[:4] == b"II*\x00" and len(payload) >= 22:
                n_tags = struct.unpack("<H", payload[8:10])[0]
                for t in range(n_tags):
                    off = 10 + 12 * t
                    tag_id, ttype, _cnt = struct.unpack("<HHI", payload[off : off + 8])
                    if tag_id == 0x0112 and ttype == 3:
                        out["orientation"] = struct.unpack("<H", payload[off + 8 : off + 10])[0]
        elif tag == b"IEND":
            break
    return out


def encode_palette(img: np.ndarray, palette: np.ndarray) -> bytes:
    """uint8 HxW index array + (<=256)x3 palette -> PNG bytes (color
    type 3, bit depth 8, PLTE chunk, filter 0) — the indexed-color
    layout common in web corpora (round 6)."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("encode_palette expects a 2-D uint8 index array")
    palette = np.asarray(palette, dtype=np.uint8)
    if palette.ndim != 2 or palette.shape[1] != 3 or len(palette) > 256:
        raise ValueError("palette must be (<=256)x3 uint8")
    if img.max(initial=0) >= len(palette):
        raise ValueError("index out of palette range")
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", palette.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_rgb(img: np.ndarray) -> bytes:
    """uint8 HxWx3 array -> PNG bytes (color type 2, bit depth 8, filter
    0) — debug-artifact color path (reference S10 heatmap writes,
    `image_processor/main.py:325-362`)."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_rgb expects an HxWx3 uint8 array")
    h, w, _ = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_rgb(data: bytes) -> np.ndarray:
    """PNG bytes (truecolor-8, filter 0 — what `encode_rgb` writes) ->
    uint8 HxWx3 array.  Debug-artifact scope only; filtered scanlines
    raise."""
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
            if depth != 8 or ctype != 2:
                raise ValueError(f"unsupported PNG: depth={depth} ctype={ctype}")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * 3 + 1
    flat = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride)
    if flat[:, 0].any():
        raise ValueError("decode_rgb supports filter-0 scanlines only")
    return flat[:, 1:].reshape(height, width, 3).copy()


def rgb_to_gray(img: np.ndarray) -> np.ndarray:
    """ITU-R BT.601 luminance: Y = 0.299 R + 0.587 G + 0.114 B, rounded.

    The K3 gray-conversion direction the reference gets from PIL/OpenCV
    (`image_processor/main.py:58-63` decodes to RGB; the engines gray it
    before detection).  Deterministic float64 math so the datagen golden
    (which measures the same conversion) is bit-identical.
    """
    y = (
        0.299 * img[:, :, 0].astype(np.float64)
        + 0.587 * img[:, :, 1].astype(np.float64)
        + 0.114 * img[:, :, 2].astype(np.float64)
    )
    return np.clip(np.rint(y), 0, 255).astype(np.uint8)


def _defilter(raw: bytes, height: int, width: int) -> np.ndarray:
    """Undo PNG scanline filtering for one 8-bit gray (sub-)image: raw is
    height x (1 + width) bytes; all five standard filters."""
    stride = width + 1
    flat = np.frombuffer(raw[: height * stride], dtype=np.uint8).reshape(
        height, stride
    )
    if not flat[:, 0].any():
        # fast path: every scanline uses filter 0 (what encode_gray writes)
        # — one reshape, no per-row Python loop or int64 widening
        return flat[:, 1:].copy()
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


def decode_gray(data: bytes) -> np.ndarray:
    """PNG bytes (grayscale-8 OR truecolor-8, non-interlaced or Adam7
    grayscale) -> uint8 HxW array.

    Truecolor (color type 2 — the reference's native ndarray shape,
    `image_processor/main.py:58-63`) is converted to luminance via
    `rgb_to_gray`; gray files take the unchanged byte-identical path.
    Adam7 (interlace 1, round 6): the seven sub-images defilter
    independently (filter context resets per pass, PNG spec 4.5.2) and
    scatter back onto the pass grid.
    """
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    interlace = 0
    ctype = 0
    plte: np.ndarray | None = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, ctype = struct.unpack(">IIBB", payload[:10])
            interlace = payload[12] if len(payload) >= 13 else 0
            if depth == 8 and ctype == 2:
                return rgb_to_gray(decode_rgb(data))
            if not (
                (depth == 8 and ctype in (0, 3)) or (depth == 16 and ctype == 0)
            ):
                raise ValueError(f"unsupported PNG: depth={depth} ctype={ctype}")
            if interlace not in (0, 1):
                raise ValueError(f"unsupported PNG interlace {interlace}")
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    bpp = 2 if depth == 16 else 1  # bytes per sample (gray)

    def _gray_rows(buf: bytes, rows: int, cols: int) -> np.ndarray:
        sub = _defilter(buf, rows, cols * bpp)
        if depth == 16:
            # network byte order: high byte first — collapse to it (the
            # 8-bit pipeline's view of a 16-bit scan, same as TIFF)
            return sub.reshape(rows, cols, 2)[:, :, 0].copy()
        return sub

    if interlace == 1:
        out = np.zeros((height, width), dtype=np.uint8)
        off = 0
        for (x0, y0, dx, dy), (pw, ph) in zip(
            _ADAM7, _adam7_dims(width, height)
        ):
            if not pw or not ph:
                continue
            n = ph * (pw * bpp + 1)
            out[y0::dy, x0::dx] = _gray_rows(raw[off : off + n], ph, pw)
            off += n
        if off != len(raw):
            raise ValueError("Adam7 data length mismatch")
    else:
        out = _gray_rows(raw, height, width)
    if ctype == 3:
        # indexed color (round 6): the defiltered plane holds palette
        # INDICES — map through PLTE, then BT.601 like any color path
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        if int(out.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        return rgb_to_gray(plte[out])
    return out
