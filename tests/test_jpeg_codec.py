"""Baseline JPEG codec unit tests (extraction/ocr/jpeg.py) + the mixed
PNG/JPEG extraction tier (reference allow-list jpg/png/tif,
/root/reference/env/local.env:25)."""

from __future__ import annotations

import numpy as np
import pytest

from ms_ocr_spark.extraction.ocr import decode_image, decode_media
from ms_ocr_spark.extraction.ocr.jpeg import (
    decode_gray_jpeg,
    encode_gray_jpeg,
    jfif_density,
)


def test_round_trip_flat_quant_error_bound():
    rng = np.random.default_rng(7)
    for shape in [(8, 8), (53, 201), (40, 64), (17, 9)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        dec = decode_gray_jpeg(encode_gray_jpeg(img))
        assert dec.shape == img.shape
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_round_trip_text_like_image():
    img = np.full((45, 180), 255, dtype=np.uint8)
    img[10:17, 20:150:3] = 0
    dec = decode_gray_jpeg(encode_gray_jpeg(img))
    # binarized content identical (the property OCR actually needs)
    assert np.array_equal(dec < 128, img < 128)


def test_jfif_density_round_trip():
    img = np.zeros((16, 16), dtype=np.uint8)
    assert jfif_density(encode_gray_jpeg(img, dpi=300.0)) == 300.0
    assert jfif_density(encode_gray_jpeg(img)) is None


def test_lossy_quant_table_decodes():
    """A non-flat quant table (real-world quality levels) still decodes;
    tables are read from the stream, not assumed."""
    rng = np.random.default_rng(3)
    img = rng.integers(100, 156, (24, 32), dtype=np.uint8)  # low contrast
    q = np.ones(64, dtype=np.int64) * 4
    dec = decode_gray_jpeg(encode_gray_jpeg(img, quant=q))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 8


def test_decode_media_dispatch():
    from ms_ocr_spark.extraction.ocr import encode_gray

    img = np.full((20, 30), 200, dtype=np.uint8)
    assert np.array_equal(decode_media(encode_gray(img)), img)
    assert np.abs(
        decode_media(encode_gray_jpeg(img)).astype(int) - img.astype(int)
    ).max() <= 2
    from ms_ocr_spark.extraction.ocr import encode_gray_tiff

    assert np.array_equal(decode_media(encode_gray_tiff(img)), img)
    with pytest.raises(ValueError):
        decode_media(b"II*\x00 truncated-garbage-tiff")
    with pytest.raises(ValueError):
        decode_media(b"garbage")


def test_truncated_jpeg_raises():
    img = np.full((24, 24), 128, dtype=np.uint8)
    data = encode_gray_jpeg(img)
    with pytest.raises(Exception):
        decode_gray_jpeg(data[:20])


def test_jpeg_tier_ocr_exact():
    """Every JPEG payload in the mixed tier decodes to its exact truth
    text through the full kernel (the hash-green property the driver
    checks at corpus level)."""
    from ms_ocr_spark.sources.datagen import gen_corpus

    _, media, _, meta, _ = gen_corpus(16, seed=45, jpeg_pct=0.6, processes=1)
    n_jpeg = 0
    for row in media.to_pylist():
        buf = bytes(row["payload"])
        if buf[:3] == b"\xff\xd8\xff":
            n_jpeg += 1
        assert decode_image(decode_media(buf)) == row["truth_text"]
    assert n_jpeg > 0
    fmts = {r["format"] for r in meta.to_pylist()}
    assert fmts == {"png", "jpeg"}
