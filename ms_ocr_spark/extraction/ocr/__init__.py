import numpy as np

from .jpeg import decode_gray_jpeg, encode_gray_jpeg, jfif_density
from .kernel import decode_image
from .png import decode_gray, encode_gray
from .tiff import decode_gray_tiff, encode_gray_tiff, tiff_dpi


def decode_media(buf: bytes) -> np.ndarray:
    """Magic-byte dispatch to the right codec (reference allow-list order
    jpg/png/tif, `/root/reference/env/local.env:25`).  Raises ValueError
    on formats the engine cannot decode — the pipeline catches that and
    quarantines the row."""
    if buf[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_gray(buf)
    if buf[:3] == b"\xff\xd8\xff":
        return decode_gray_jpeg(buf)
    if buf[:4] in (b"II*\0", b"MM\0*"):
        return decode_gray_tiff(buf)
    raise ValueError("undecodable media format")


__all__ = [
    "decode_image",
    "decode_gray",
    "encode_gray",
    "decode_gray_jpeg",
    "encode_gray_jpeg",
    "jfif_density",
    "decode_gray_tiff",
    "encode_gray_tiff",
    "tiff_dpi",
    "decode_media",
]
