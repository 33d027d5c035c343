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


# ---------------------------------------------------------------- progressive
from ms_ocr_spark.extraction.ocr.jpeg import (  # noqa: E402
    encode_gray_jpeg_progressive,
    encode_multicomponent_stub,
    encode_progressive_stub,
    is_progressive_jpeg,
    jpeg_scope_reason,
)


def _image_zoo() -> list[np.ndarray]:
    rng = np.random.default_rng(11)
    zoo = [
        rng.integers(0, 256, (40, 72), dtype=np.uint8),  # noise
        np.full((5, 6), 200, dtype=np.uint8),  # sub-block tiny
    ]
    # mostly-white sparse image: nearly all AC-empty blocks, so the
    # encoder MUST accumulate cross-block EOB runs (> 1) and the decoder
    # MUST replay them (the round-4 decode-scope gap's hardest path)
    a = np.full((64, 128), 255, dtype=np.uint8)
    a[30:33, 60:63] = 0
    zoo.append(a)
    # high-frequency checkerboard: dense AC bands incl. ZRL runs
    c = np.zeros((48, 48), dtype=np.uint8)
    c[::2, ::2] = 255
    c[1::2, 1::2] = 255
    zoo.append(c)
    from ms_ocr_spark.extraction.ocr.glyphs import render_text

    zoo.append(render_text("PROGRESSIVE JPEG\nSCAN 123"))
    return zoo


def test_progressive_decode_bit_identical_to_baseline():
    """The 6-scan script carries the quantized coefficients to full
    precision, so progressive decode == baseline decode EXACTLY."""
    for img in _image_zoo():
        pb = encode_gray_jpeg_progressive(img)
        assert is_progressive_jpeg(pb)
        assert jpeg_scope_reason(pb) is None
        assert np.array_equal(
            decode_gray_jpeg(pb), decode_gray_jpeg(encode_gray_jpeg(img))
        )


def test_progressive_eob_runs_actually_accumulate():
    """Guard against the encoder silently degrading to EOBRUN<=1 (which
    would leave the decoder's multi-block EOB-run path untested): the
    sparse image's AC-first scan must contain an EOBn symbol with n>0,
    i.e. the scan must be shorter than one EOB code per block."""
    from ms_ocr_spark.extraction.ocr.jpeg import _enc_ac_first, _quantize_blocks

    # all-white image: every block's AC band is empty, so the whole scan
    # must be ONE EOBn symbol covering all 128 blocks (9-bit code + 7
    # run-length bits = 2 bytes) — an EOBRUN<=1 encoder would emit 128
    # symbols (~144 bytes)
    zz = _quantize_blocks(np.full((64, 128), 255, dtype=np.uint8),
                          np.ones(64, dtype=np.int64))
    assert zz.shape[0] == 128
    scan = _enc_ac_first(zz, 6, 63, 1)
    assert len(scan) <= 4, len(scan)
    # and the sparse dotted image (two dense blocks mid-run) still
    # round-trips exactly -> the decoder replays multi-block EOB runs
    a = np.full((64, 128), 255, dtype=np.uint8)
    a[30:33, 60:63] = 0
    assert np.array_equal(
        decode_gray_jpeg(encode_gray_jpeg_progressive(a)),
        decode_gray_jpeg(encode_gray_jpeg(a)),
    )


def test_progressive_decode_with_fill_bytes_and_dispatch():
    img = (np.arange(40 * 72).reshape(40, 72) % 256).astype(np.uint8)
    pb = encode_gray_jpeg_progressive(img)
    i = pb.find(b"\xff\xc2")
    padded = pb[:i] + b"\xff\xff" + pb[i:]
    j = padded.find(b"\xff\xda", padded.find(b"\xff\xda") + 2)
    padded = padded[:j] + b"\xff" + padded[j:]
    assert np.array_equal(
        decode_media(padded), decode_gray_jpeg(encode_gray_jpeg(img))
    )


def test_progressive_jfif_density():
    img = np.zeros((16, 16), dtype=np.uint8)
    assert jfif_density(encode_gray_jpeg_progressive(img, dpi=144.0)) == 144.0


def test_jpeg_scope_reasons():
    img = np.full((24, 24), 128, dtype=np.uint8)
    assert jpeg_scope_reason(encode_gray_jpeg(img)) is None
    assert jpeg_scope_reason(encode_gray_jpeg_progressive(img)) is None
    assert jpeg_scope_reason(encode_progressive_stub()) == "truncated_jpeg"
    assert (
        jpeg_scope_reason(encode_multicomponent_stub())
        == "unsupported_jpeg_layout"
    )
    # cut mid-markers -> truncated
    assert jpeg_scope_reason(encode_gray_jpeg(img)[:12]) == "truncated_jpeg"
    with pytest.raises(Exception):
        decode_gray_jpeg(encode_progressive_stub())


def test_progressive_tier_ocr_exact():
    """Every progressive payload in the mixed tier decodes to its exact
    truth text through the full kernel."""
    from ms_ocr_spark.sources.datagen import gen_corpus

    _, media, _, _, _ = gen_corpus(
        16, seed=52, jpeg_pct=0.15, prog_jpeg_pct=0.45, processes=1
    )
    n_prog = 0
    for row in media.to_pylist():
        buf = bytes(row["payload"])
        if is_progressive_jpeg(buf):
            n_prog += 1
        assert decode_image(decode_media(buf)) == row["truth_text"]
    assert n_prog > 0


def test_jpeg_side_values_round_trip():
    """APP1 EXIF orientation + APP2 ICC name + JFIF dpi parse back from
    both baseline and progressive encodings (S5 side-value parity)."""
    from ms_ocr_spark.extraction.ocr.jpeg import jpeg_side_values

    img = np.full((24, 40), 180, dtype=np.uint8)
    for enc in (encode_gray_jpeg, encode_gray_jpeg_progressive):
        b = enc(img, dpi=150.0, icc_name="synthetic-gray", exif_orientation=1)
        assert jpeg_side_values(b) == {
            "dpi": 150.0,
            "icc_name": "synthetic-gray",
            "orientation": 1,
        }
        # side segments never perturb pixel decode
        assert np.array_equal(decode_gray_jpeg(b), decode_gray_jpeg(enc(img)))
        assert jpeg_side_values(enc(img)) == {
            "dpi": None,
            "icc_name": None,
            "orientation": None,
        }
    assert jpeg_side_values(b"garbage") == {
        "dpi": None,
        "icc_name": None,
        "orientation": None,
    }


def test_icc_profile_name_rejects_garbage():
    from ms_ocr_spark.extraction.ocr.icc import icc_profile, icc_profile_name

    assert icc_profile_name(icc_profile("abc")) == "abc"
    assert icc_profile_name(b"\x00" * 200) is None
    assert icc_profile_name(b"short") is None
    assert icc_profile_name(None) is None


def test_restart_interval_round_trip():
    """DRI/RSTn (T.81 B.2.1.2, round 5): restart-marked streams decode
    bit-identically to their unrestarted encoding at any interval —
    DC-predictor resets and byte re-alignment replay exactly; side-value
    segments compose."""
    from ms_ocr_spark.extraction.ocr.jpeg import jpeg_side_values

    rng = np.random.default_rng(5)
    imgs = [
        rng.integers(0, 256, (53, 201), dtype=np.uint8),
        np.full((64, 128), 255, dtype=np.uint8),
    ]
    for img in imgs:
        ref = decode_gray_jpeg(encode_gray_jpeg(img))
        for ri in (1, 3, 8, 10000):
            b = encode_gray_jpeg(img, restart_interval=ri)
            assert jpeg_scope_reason(b) is None
            assert np.array_equal(decode_gray_jpeg(b), ref), ri
        b = encode_gray_jpeg(
            img, dpi=72.0, icc_name="x", exif_orientation=1, restart_interval=5
        )
        assert np.array_equal(decode_gray_jpeg(b), ref)
        assert jpeg_side_values(b)["icc_name"] == "x"


def test_restart_interval_missing_segment_raises():
    img = np.random.default_rng(5).integers(0, 256, (53, 201), dtype=np.uint8)
    b = encode_gray_jpeg(img, restart_interval=8)
    i = b.find(b"\xff\xd0")
    with pytest.raises(Exception):
        decode_gray_jpeg(b[:i] + b[i + 2 :][:-50])


def test_dri_scope_baseline_ok_progressive_unsupported():
    """DRI is in scope for baseline (decodes), out of scope for the
    progressive decoder — the probe reason reflects both."""
    img = np.full((24, 24), 128, dtype=np.uint8)
    assert jpeg_scope_reason(encode_gray_jpeg(img, restart_interval=4)) is None
    pb = encode_gray_jpeg_progressive(img)
    i = pb.find(b"\xff\xda")
    # splice a DRI segment (marker + len 4 + interval 4) before the SOS
    with_dri = pb[:i] + b"\xff\xdd\x00\x04\x00\x04" + pb[i:]
    assert jpeg_scope_reason(with_dri) == "unsupported_jpeg_layout"
    with pytest.raises(ValueError):
        decode_gray_jpeg(with_dri)
