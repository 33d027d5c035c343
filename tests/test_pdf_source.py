"""PDF text-extraction source tests (extraction/pdf.py, round 5 —
north_rule 'PDF/layout parse': the inverse of the PDF overlay sink)."""

from __future__ import annotations

import pytest

from ms_ocr_spark.extraction.pdf import pdf_text_spans
from ms_ocr_spark.operators.sinks import pdf_from_boxes


def test_pdf_round_trip_escapes_and_order():
    boxes = [
        {"x1": 10, "y1": 20, "x2": 60, "y2": 35, "text": "HELLO (WORLD)"},
        {"x1": 15, "y1": 50, "x2": 90, "y2": 65, "text": "back\\slash"},
        {"x1": 100, "y1": 20, "x2": 160, "y2": 35, "text": "SPARK 42"},
    ]
    spans = pdf_text_spans(pdf_from_boxes(boxes))
    assert spans == [
        (0, 10.0, 762.0, "HELLO (WORLD)"),
        (0, 100.0, 762.0, "SPARK 42"),
        (0, 15.0, 732.0, "back\\slash"),
    ]


def test_pdf_uncompressed_stream_and_td_tj_array():
    """Hand-built PDF without Flate, using Td line moves and a TJ array
    with kerning numbers — the general operator subset, not just the
    sink's dialect."""
    content = (
        b"BT /F1 10 Tf 1 0 0 1 50 700 Tm (first) Tj "
        b"0 -20 Td [(se) -120 (cond)] TJ ET"
    )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 5 0 R >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
    ]
    out = bytearray(b"%PDF-1.4\n")
    for i, body in enumerate(objs, 1):
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    out += b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"
    spans = pdf_text_spans(bytes(out))
    assert spans == [(0, 50.0, 700.0, "first"), (0, 50.0, 680.0, "second")]


def test_pdf_garbage_raises():
    with pytest.raises(ValueError):
        pdf_text_spans(b"not a pdf at all")
    with pytest.raises(ValueError):
        pdf_text_spans(b"%PDF-1.4\nno objects here")


def test_pdf_extract_spans_df_null_contract(spark):
    from ms_ocr_spark.extraction.pdf import pdf_extract_spans_df

    boxes = [{"x1": 10, "y1": 20, "x2": 60, "y2": 35, "text": "A1"}]
    rows = [
        ("good", bytearray(pdf_from_boxes(boxes))),
        ("bad", bytearray(b"garbage")),
    ]
    df = spark.createDataFrame(rows, "doc_id string, artifact binary")
    out = {r["doc_id"]: r for r in pdf_extract_spans_df(df).collect()}
    assert out["good"]["text"] == "A1" and out["good"]["page"] == 0
    assert out["bad"]["page"] is None and out["bad"]["text"] is None


def test_pdf_multipage_kids_order():
    """A hand-built 2-page PDF: spans resolve through the /Pages tree in
    /Kids order with per-page content streams."""
    c1 = b"BT 1 0 0 1 10 700 Tm (page-zero) Tj ET"
    c2 = b"BT 1 0 0 1 20 650 Tm (page-one) Tj ET"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 5 0 R >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 6 0 R >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(c1), c1),
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(c2), c2),
    ]
    out = bytearray(b"%PDF-1.4\n")
    for i, body in enumerate(objs, 1):
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    out += b"trailer\n<< /Size 7 /Root 1 0 R >>\n%%EOF\n"
    assert pdf_text_spans(bytes(out)) == [
        (0, 10.0, 700.0, "page-zero"),
        (1, 20.0, 650.0, "page-one"),
    ]
