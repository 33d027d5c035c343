"""Unit tests for the pure-Python extraction kernels (SURVEY.md §5 item 1)."""

from __future__ import annotations

import numpy as np
import pytest

from ms_ocr_spark.extraction.arc90 import extract_main_text
from ms_ocr_spark.extraction.ocr.glyphs import ALPHABET, glyph_bitmap, render_text
from ms_ocr_spark.extraction.ocr.kernel import (
    binarize,
    connected_components,
    decode_image,
    estimate_skew,
    median3,
    rotate_bilinear,
)
from ms_ocr_spark.extraction.ocr.png import decode_gray, encode_gray
from ms_ocr_spark.sources import datagen


def test_png_round_trip():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(33, 57), dtype=np.uint8)
    assert np.array_equal(decode_gray(encode_gray(img)), img)


def test_glyphs_distinct():
    bitmaps = {ch: glyph_bitmap(ch) for ch in ALPHABET}
    assert len(ALPHABET) == 36
    chars = sorted(bitmaps)
    for i, a in enumerate(chars):
        for b in chars[i + 1 :]:
            d = int(np.count_nonzero(bitmaps[a] != bitmaps[b]))
            assert d >= 3, f"{a} vs {b} differ by only {d} px"


def test_glyph_rows_all_inked():
    # line banding assumes every glyph has ink in its top and bottom rows
    for ch in ALPHABET:
        bm = glyph_bitmap(ch)
        assert bm[0].any() and bm[-1].any(), ch


def test_decode_clean():
    img = render_text("HELLO WORLD\nSPARK 42")
    assert decode_image(img) == "HELLO WORLD\nSPARK 42"


@pytest.mark.parametrize("deg", [-3.0, -1.5, -0.5, 0.5, 2.0, 3.0])
def test_decode_rotated(deg):
    img = rotate_bilinear(render_text("GRAFT KERNEL\nDECODE 42"), deg)
    assert decode_image(img) == "GRAFT KERNEL\nDECODE 42"


def test_estimate_skew_returns_correction():
    img = render_text("LINE GRAFT HELLO")
    rot = rotate_bilinear(img, 2.0)
    assert estimate_skew(binarize(median3(rot))) == -2.0


def test_connected_components_counts():
    mask = np.zeros((10, 10), dtype=bool)
    mask[1:3, 1:3] = True
    mask[5:9, 5:7] = True
    mask[0, 9] = True  # single pixel
    boxes = connected_components(mask)
    assert sorted(boxes) == [(1, 1, 3, 3), (5, 5, 7, 9), (9, 0, 10, 1)]


def test_connected_components_diagonal_is_8_connected():
    mask = np.eye(5, dtype=bool)
    assert connected_components(mask) == [(0, 0, 5, 5)]


def test_ocr_corpus_round_trip():
    """End-to-end kernel accuracy on 300 corpus-distribution samples."""
    for i in range(300):
        truth = datagen.make_media_truth(42, i, i % 5)
        payload = datagen.render_media_payload(42, f"img-t-{i}", truth)
        assert decode_image(decode_gray(payload)) == truth, f"sample {i}: {truth!r}"


def test_arc90_recovers_generated_main_text():
    for i in range(50):
        html, main = datagen.make_text_span_html(42, i, i % 4)
        assert extract_main_text(html) == main, f"doc {i}"


def test_arc90_plain_text_fallback():
    assert extract_main_text("just  plain   text") == "just plain text"
    assert extract_main_text(None) is None


def test_arc90_prefers_low_link_density():
    html = (
        "<html><body>"
        '<div><p>short intro, with a comma, here and more text to score.</p>'
        '<a href="#">a</a><a href="#">lots</a><a href="#">of links in this container</a>'
        "</div>"
        "<div><p>the real content paragraph, long and comma rich, stays here today.</p>"
        "<p>another content paragraph, again with commas, and plenty of words.</p></div>"
        "</body></html>"
    )
    out = extract_main_text(html)
    assert out is not None and out.startswith("the real content paragraph")
    assert "links" not in out
