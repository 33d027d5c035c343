"""Artifact sinks (reference S7 PDF overlay, S8 XLSX table)."""

from __future__ import annotations

import io
import zipfile
import zlib

from ms_ocr_spark.operators.sinks import (
    pdf_from_boxes,
    pdf_overlay_bytes,
    table_xlsx_bytes,
    xlsx_from_cells,
)


def _cells():
    return [
        {"doc_id": "d", "row_idx": 0, "col_idx": 0, "cell_text": "A1", "row_span": 1, "col_span": 1},
        {"doc_id": "d", "row_idx": 0, "col_idx": 1, "cell_text": "WIDE <&>", "row_span": 1, "col_span": 2},
        {"doc_id": "d", "row_idx": 1, "col_idx": 0, "cell_text": "tall", "row_span": 2, "col_span": 1},
        {"doc_id": "d", "row_idx": 1, "col_idx": 2, "cell_text": "x", "row_span": 1, "col_span": 1},
    ]


def test_xlsx_structure_and_merges():
    data = xlsx_from_cells(_cells())
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        names = set(z.namelist())
        assert "xl/worksheets/sheet1.xml" in names and "xl/workbook.xml" in names
        sheet = z.read("xl/worksheets/sheet1.xml").decode()
    assert '<c r="A1" t="inlineStr"><is><t xml:space="preserve">A1</t></is></c>' in sheet
    assert "WIDE &lt;&amp;&gt;" in sheet  # XML-escaped
    assert '<mergeCell ref="B1:C1"/>' in sheet  # col_span 2
    assert '<mergeCell ref="A2:A3"/>' in sheet  # row_span 2
    # deterministic bytes (fixed zip timestamps)
    assert data == xlsx_from_cells(_cells())


def test_xlsx_sink_distributed(spark):
    rows = [(c["doc_id"], c["row_idx"], c["col_idx"], c["cell_text"], c["row_span"], c["col_span"]) for c in _cells()]
    df = spark.createDataFrame(
        rows, "doc_id string, row_idx long, col_idx long, cell_text string, row_span long, col_span long"
    )
    out = table_xlsx_bytes(df).collect()
    assert len(out) == 1 and out[0]["doc_id"] == "d"
    with zipfile.ZipFile(io.BytesIO(bytes(out[0]["artifact"]))) as z:
        assert "xl/worksheets/sheet1.xml" in z.namelist()


def test_pdf_overlay_structure():
    boxes = [
        {"doc_id": "d", "x1": 10, "y1": 20, "x2": 60, "y2": 40, "text": "HELLO (1)"},
        {"doc_id": "d", "x1": 10, "y1": 60, "x2": 60, "y2": 80, "text": "WORLD"},
    ]
    data = pdf_from_boxes(boxes)
    assert data.startswith(b"%PDF-1.4") and data.rstrip().endswith(b"%%EOF")
    # extract + inflate the content stream, check overlay text and escaping
    start = data.index(b"stream\n") + 7
    end = data.index(b"\nendstream")
    content = zlib.decompress(data[start:end]).decode()
    assert r"(HELLO \(1\)) Tj" in content and "(WORLD) Tj" in content
    # y-flip: first box (y1=20) lands at 792-20-10=762
    assert "1 0 0 1 10.0 762.0 Tm" in content
    assert data == pdf_from_boxes(boxes)  # deterministic


def test_pdf_sink_distributed(spark):
    df = spark.createDataFrame(
        [("d", 0, 10, 20, 60, 40, "HI")],
        "doc_id string, box_id long, x1 long, y1 long, x2 long, y2 long, text string",
    )
    out = pdf_overlay_bytes(df).collect()
    assert len(out) == 1 and bytes(out[0]["artifact"]).startswith(b"%PDF")
