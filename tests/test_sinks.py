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
        styles = z.read("xl/styles.xml").decode()
        ct = z.read("[Content_Types].xml").decode()
    # cell styling parity (reference _excel: Calibri 11, thin borders,
    # center/center + wrap): every cell points at cellXfs index 1
    assert "/xl/styles.xml" in ct
    assert '<name val="Calibri"/>' in styles and '<sz val="11"/>' in styles
    assert styles.count('style="thin"') == 4
    assert '<alignment horizontal="center" vertical="center" wrapText="1"/>' in styles
    assert '<c r="A1" s="1" t="inlineStr"><is><t xml:space="preserve">A1</t></is></c>' in sheet
    assert "WIDE &lt;&amp;&gt;" in sheet  # XML-escaped
    assert '<mergeCell ref="B1:C1"/>' in sheet  # col_span 2
    assert '<mergeCell ref="A2:A3"/>' in sheet  # row_span 2
    # deterministic bytes (fixed zip timestamps)
    assert data == xlsx_from_cells(_cells())


def test_xlsx_row_heights():
    """Auto row heights (reference `_excel` parity, data_to_table/
    main.py:119-149): 18/line for non-merged cells; a merged range
    ASSIGNS its rows the origin's 18 x lines spread over the range
    (floor 18), overriding the per-row rule."""
    cells = [
        # row 0: plain 3-line cell -> ht 54
        {"doc_id": "d", "row_idx": 0, "col_idx": 0, "cell_text": "a\nb\nc", "row_span": 1, "col_span": 1},
        # rows 1-2: vertical merge, 3-line origin -> 18*3/2 = 27 each
        {"doc_id": "d", "row_idx": 1, "col_idx": 0, "cell_text": "x\ny\nz", "row_span": 2, "col_span": 1},
        # row 3: single-line -> default 18
        {"doc_id": "d", "row_idx": 3, "col_idx": 0, "cell_text": "end", "row_span": 1, "col_span": 1},
    ]
    with zipfile.ZipFile(io.BytesIO(xlsx_from_cells(cells))) as z:
        sheet = z.read("xl/worksheets/sheet1.xml").decode()
    assert '<row r="1" ht="54" customHeight="1">' in sheet
    assert '<row r="2" ht="27" customHeight="1">' in sheet
    assert '<row r="3" ht="27" customHeight="1">' in sheet
    assert '<row r="4" ht="18" customHeight="1">' in sheet

    # overlapping merges: the LATER range's assignment wins (reference
    # iterates merged ranges in insertion order and sets, not maxes)
    cells.append(
        {"doc_id": "d", "row_idx": 1, "col_idx": 1, "cell_text": "p\nq", "row_span": 2, "col_span": 1}
    )
    with zipfile.ZipFile(io.BytesIO(xlsx_from_cells(cells))) as z:
        sheet = z.read("xl/worksheets/sheet1.xml").decode()
    assert '<row r="2" ht="18" customHeight="1">' in sheet  # 18*2/2
    assert '<row r="3" ht="18" customHeight="1">' in sheet


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


def test_debug_image_sink(spark, tmp_path):
    """S10 debug image sink: every decodable payload yields the five
    kernel-stage PNGs (gray stages round-trip through decode_gray, the
    JET heatmap through decode_rgb); undecodable payloads yield nothing."""
    import numpy as np

    from ms_ocr_spark.extraction.ocr import decode_gray
    from ms_ocr_spark.extraction.ocr.png import decode_rgb
    from ms_ocr_spark.operators.sinks import debug_image_bytes
    from ms_ocr_spark.sources.datagen import write_corpus

    paths = write_corpus(str(tmp_path / "dbg"), n_docs=4, seed=19)
    media = spark.read.parquet(paths["media_store"]).limit(3)
    extra = spark.createDataFrame(
        [("bad-ref", bytearray(b"garbage-not-an-image"))],
        media.select("media_ref", "payload").schema,
    )
    rows = debug_image_bytes(media.select("media_ref", "payload").union(extra)).collect()
    by_ref: dict = {}
    for r in rows:
        by_ref.setdefault(r["media_ref"], {})[r["stage"]] = bytes(r["artifact"])
    assert "bad-ref" not in by_ref
    assert len(by_ref) == 3
    for stages in by_ref.values():
        assert set(stages) == {"gray", "deskewed", "binarized", "boxes", "heatmap"}
        mask = decode_gray(stages["binarized"])
        assert set(np.unique(mask)) <= {0, 255}
        hm = decode_rgb(stages["heatmap"])
        assert hm.ndim == 3 and hm.shape[2] == 3
        # heatmap/boxes are drawn in the DESKEWED space (rotation can
        # expand the canvas relative to the raw gray input)
        assert decode_gray(stages["deskewed"]).shape == hm.shape[:2]
        assert decode_gray(stages["boxes"]).shape == hm.shape[:2]
