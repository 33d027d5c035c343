"""Property-based tests (hypothesis) for order-sensitive kernels
(SURVEY.md §5 item 4)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ms_ocr_spark.extraction.arc90 import extract_main_text
from ms_ocr_spark.extraction.ocr.glyphs import ALPHABET, render_text
from ms_ocr_spark.extraction.ocr.kernel import decode_image
from ms_ocr_spark.extraction.ocr.png import decode_gray, encode_gray


def _merge_ref(intervals: list[tuple[int, int]], gap: int = 0) -> list[tuple[int, int]]:
    out: list[list[int]] = []
    for s, e in sorted(intervals):
        if out and s <= out[-1][1] + gap:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return [tuple(x) for x in out]


@given(
    st.lists(
        st.tuples(st.integers(0, 1000), st.integers(1, 50)).map(
            lambda t: (t[0], t[0] + t[1])
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=50, deadline=None)
def test_interval_merge_reference_properties(intervals):
    """The pure merge is idempotent and covers exactly the input union."""
    merged = _merge_ref(intervals)
    # idempotent
    assert _merge_ref(merged) == merged
    # disjoint and sorted
    for (s1, e1), (s2, e2) in zip(merged, merged[1:]):
        assert e1 < s2
    # coverage: every input point inside some merged interval
    for s, e in intervals:
        assert any(ms <= s and e <= me for ms, me in merged)


# Realistic word shapes: letters/digits with at most ONE trailing
# punctuation char (the corpus generator's contract).  Runs of adjacent
# narrow punctuation (e.g. ":,") leave inter-glyph gaps as wide as a word
# space — a structural ambiguity of gap-based tokenization that real
# corpora don't exercise.
_PUNCT = ".,!?-':;"
_CORE = "".join(c for c in ALPHABET if c not in _PUNCT)
_WORDS = st.lists(
    st.builds(
        lambda w, p: w + p,
        st.text(alphabet=_CORE, min_size=1, max_size=6),
        st.sampled_from([""] * 3 + list(_PUNCT)),
    ),
    min_size=1,
    max_size=4,
).map(lambda ws: ["H" + ws[0]] + ws[1:])
# the "H" prefix guarantees the line a tall anchor — size classing of
# x-height glyphs needs one (datagen sentence-cases for the same reason);
# an all-short line like "oo" is ambiguous to any baseline-free matcher


@given(_WORDS)
@settings(max_examples=30, deadline=None)
def test_ocr_render_decode_inverse(words):
    """decode ∘ encode ∘ render == identity on the glyph alphabet."""
    text = " ".join(words)
    assert decode_image(decode_gray(encode_gray(render_text(text)))) == text


@given(st.binary(min_size=0, max_size=4000))
@settings(max_examples=60, deadline=None)
def test_lzw_round_trip_arbitrary_bytes(data):
    """TIFF LZW (early-change, table reset) is the identity through a
    compress/decompress round trip for arbitrary byte strings."""
    from ms_ocr_spark.extraction.ocr.tiff import _lzw_compress, _lzw_decompress

    assert _lzw_decompress(_lzw_compress(data), len(data)) == data


@given(st.binary(min_size=0, max_size=4000))
@settings(max_examples=60, deadline=None)
def test_packbits_round_trip_arbitrary_bytes(data):
    from ms_ocr_spark.extraction.ocr.tiff import _packbits, _unpackbits

    assert _unpackbits(_packbits(data), len(data)) == data


@given(
    st.binary(min_size=1, max_size=800),
    st.sampled_from([1, 5, 32773]),
    st.sampled_from([8, 16]),
)
@settings(max_examples=40, deadline=None)
def test_tiff_encode_decode_inverse(raw, comp, bits):
    """decode ∘ encode == identity for every compression/bit-depth
    variant over arbitrary pixel content and shapes."""
    import numpy as np

    from ms_ocr_spark.extraction.ocr.tiff import decode_gray_tiff, encode_gray_tiff

    n = len(raw)
    w = max(1, min(n, 37))
    h = n // w
    if h == 0:
        return
    img = np.frombuffer(raw[: h * w], dtype=np.uint8).reshape(h, w)
    out = decode_gray_tiff(encode_gray_tiff(img, compression=comp, bits=bits))
    assert np.array_equal(out, img)


@given(st.text(min_size=0, max_size=200))
@settings(max_examples=50, deadline=None)
def test_arc90_total_on_arbitrary_strings(s):
    """The extractor never raises on arbitrary (non-HTML) input and always
    returns whitespace-normalized text."""
    out = extract_main_text(s)
    assert out is None or out == " ".join(out.split())
