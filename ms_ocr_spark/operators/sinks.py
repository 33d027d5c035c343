"""Artifact sinks: XLSX table workbook (S8) and PDF text overlay (S7).

Re-expresses the reference's visual result artifacts as DataFrame sinks —
one binary artifact per document, assembled inside a grouped pandas UDF
(artifacts are small per doc; this is the result-export path, never the
hot path):

  * table_xlsx_bytes ~ `DataToTable._excel()` (`/root/reference/src/
    library/data_to_table/main.py:100-175`): one worksheet per document
    with the dense matrix and merged-cell ranges.
  * pdf_overlay_bytes ~ the per-engine `*_result.pdf` overlay
    (`engine_tesseract/main.py:108`, canvas built `image_processor/
    main.py:28-38`): recognized text drawn at its box position on a
    white page.

Both writers are stdlib-only (zipfile/zlib/struct) and byte-deterministic
(fixed zip timestamps, fixed object ordering) so artifacts are stable
across runs and testable by exact content checks.
"""

from __future__ import annotations

import io
import zipfile
import zlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

ARTIFACT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("artifact", T.BinaryType()),
    ]
)


def _col_letter(idx: int) -> str:
    """0-based column index -> spreadsheet letters (A, B, ..., AA...)."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace('"', "&quot;")
    )


_XLSX_STATIC = {
    "[Content_Types].xml": (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        '<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
        "</Types>"
    ),
    "_rels/.rels": (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    ),
    "xl/workbook.xml": (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    ),
    "xl/_rels/workbook.xml.rels": (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>'
        "</Relationships>"
    ),
    # cell style parity with the reference `_excel` loop
    # (`data_to_table/main.py:123-124,167`): Calibri 11, thin border on all
    # four sides, center/center alignment with wrap — applied to every cell
    # via cellXfs index 1 (index 0 stays the OOXML default xf)
    "xl/styles.xml": (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        '<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>'
        '<fills count="2"><fill><patternFill patternType="none"/></fill>'
        '<fill><patternFill patternType="gray125"/></fill></fills>'
        '<borders count="2"><border><left/><right/><top/><bottom/><diagonal/></border>'
        '<border><left style="thin"/><right style="thin"/><top style="thin"/>'
        '<bottom style="thin"/><diagonal/></border></borders>'
        '<cellStyleXfs count="1"><xf numFmtId="0" fontId="0" fillId="0" borderId="0"/></cellStyleXfs>'
        '<cellXfs count="2">'
        '<xf numFmtId="0" fontId="0" fillId="0" borderId="0" xfId="0"/>'
        '<xf numFmtId="0" fontId="0" fillId="0" borderId="1" xfId="0" '
        'applyBorder="1" applyAlignment="1">'
        '<alignment horizontal="center" vertical="center" wrapText="1"/></xf>'
        "</cellXfs></styleSheet>"
    ),
}


def display_width(s: str) -> int:
    """East-Asian display width (reference F5 `_unicodeTextLength`,
    `/root/reference/src/library/data_to_table/main.py:22-33`): wide/
    fullwidth characters count 2 columns, everything else 1."""
    import unicodedata

    return sum(2 if unicodedata.east_asian_width(ch) in ("W", "F") else 1 for ch in s)


# reference `_excel` default row height (`data_to_table/main.py:296`)
_CELL_H_DEFAULT = 18


def xlsx_from_cells(cells: list[dict]) -> bytes:
    """One-worksheet XLSX from matrix cells
    [{row_idx, col_idx, cell_text, row_span, col_span}, ...] — inline
    strings, merged ranges from the spans (reference `_excel` semantics:
    merge ranges carry the origin's text)."""
    by_pos = {(c["row_idx"], c["col_idx"]): c for c in cells}
    n_rows = max(c["row_idx"] for c in cells) + 1 if cells else 0
    n_cols = max(c["col_idx"] for c in cells) + 1 if cells else 0
    # auto row heights (reference `_excel` parity, `data_to_table/
    # main.py:119-149`, cellHeightDefault=18):
    #   1. per row, 18 x the max line count among NON-merged cells;
    #   2. each merged range then ASSIGNS its rows 18 x origin-line-count
    #      spread evenly over the range (floor 18), in row-major anchor
    #      order (= openpyxl merged_cells insertion order), overriding 1.
    row_h = {r: _CELL_H_DEFAULT for r in range(n_rows)}
    for r in range(n_rows):
        for c in range(n_cols):
            cell = by_pos.get((r, c))
            if cell is None:
                continue
            if int(cell.get("row_span", 1)) == 1 and int(cell.get("col_span", 1)) == 1:
                lines = str(cell["cell_text"]).count("\n") + 1
                row_h[r] = max(row_h[r], _CELL_H_DEFAULT * lines)
    for r in range(n_rows):
        for c in range(n_cols):
            cell = by_pos.get((r, c))
            if cell is None:
                continue
            rs, cspan = int(cell.get("row_span", 1)), int(cell.get("col_span", 1))
            if rs > 1 or cspan > 1:
                lines = str(cell["cell_text"]).count("\n") + 1
                h = max(_CELL_H_DEFAULT * lines / rs, _CELL_H_DEFAULT)
                for rr in range(r, r + rs):
                    row_h[rr] = h
    rows_xml = []
    merges = []
    for r in range(n_rows):
        cs = []
        for c in range(n_cols):
            cell = by_pos.get((r, c))
            if cell is None:
                continue
            ref = f"{_col_letter(c)}{r + 1}"
            cs.append(
                f'<c r="{ref}" s="1" t="inlineStr"><is><t xml:space="preserve">'
                f"{_xml_escape(str(cell['cell_text']))}</t></is></c>"
            )
            rs, cspan = int(cell.get("row_span", 1)), int(cell.get("col_span", 1))
            if rs > 1 or cspan > 1:
                end = f"{_col_letter(c + cspan - 1)}{r + rs}"
                merges.append(f"{ref}:{end}")
        rows_xml.append(
            f'<row r="{r + 1}" ht="{row_h[r]:g}" customHeight="1">'
            f"{''.join(cs)}</row>"
        )
    merge_xml = (
        f'<mergeCells count="{len(merges)}">'
        + "".join(f'<mergeCell ref="{m}"/>' for m in merges)
        + "</mergeCells>"
        if merges
        else ""
    )
    # column widths from the widest cell's DISPLAY width (reference
    # `_excel` auto-sizing uses the East-Asian width, main.py:160-173)
    col_w: dict[int, int] = {}
    for c in cells:
        ci = c["col_idx"]
        col_w[ci] = max(col_w.get(ci, 0), display_width(str(c["cell_text"])))
    cols_xml = (
        "<cols>"
        + "".join(
            f'<col min="{ci + 1}" max="{ci + 1}" width="{w + 2}" customWidth="1"/>'
            for ci, w in sorted(col_w.items())
        )
        + "</cols>"
        if col_w
        else ""
    )
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"{cols_xml}<sheetData>{''.join(rows_xml)}</sheetData>{merge_xml}</worksheet>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for name, content in list(_XLSX_STATIC.items()) + [("xl/worksheets/sheet1.xml", sheet)]:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            z.writestr(info, content)
    return buf.getvalue()


def table_xlsx_bytes(cells_df: DataFrame, doc_col: str = "doc_id") -> DataFrame:
    """(doc_id, artifact=XLSX bytes) from table_cells output rows."""

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        doc = pdf[doc_col].iloc[0]
        return pd.DataFrame(
            [(doc, xlsx_from_cells(pdf.to_dict("records")))],
            columns=["doc_id", "artifact"],
        )

    return cells_df.groupBy(doc_col).applyInPandas(_build, schema=ARTIFACT_SCHEMA)


def pdf_from_boxes(boxes: list[dict], page_w: int = 612, page_h: int = 792) -> bytes:
    """Minimal one-page PDF: each box's text drawn at its (x1, y1) with
    the PDF y-axis flip (reference white-canvas overlay).  Deterministic
    object ordering; Flate-compressed content stream."""
    parts = ["BT /F1 10 Tf"]
    for b in sorted(boxes, key=lambda b: (b["y1"], b["x1"])):
        x = float(b["x1"])
        y = page_h - float(b["y1"]) - 10
        text = (
            str(b["text"]).replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        )
        parts.append(f"1 0 0 1 {x:.1f} {y:.1f} Tm ({text}) Tj")
    parts.append("ET")
    stream = zlib.compress("\n".join(parts).encode("latin-1", "replace"))
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Kids [3 0 R] /Count 1 >>".encode(),
        (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {page_w} {page_h}] "
            "/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>"
        ).encode(),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        (f"<< /Length {len(stream)} /Filter /FlateDecode >>\nstream\n").encode()
        + stream
        + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def pdf_overlay_bytes(boxes_df: DataFrame, doc_col: str = "doc_id") -> DataFrame:
    """(doc_id, artifact=PDF bytes) from OCR box rows
    (x1, y1, x2, y2, text per row — `tables.ocr_boxes` output shape)."""

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        doc = pdf[doc_col].iloc[0]
        return pd.DataFrame(
            [(doc, pdf_from_boxes(pdf.to_dict("records")))],
            columns=["doc_id", "artifact"],
        )

    return boxes_df.groupBy(doc_col).applyInPandas(_build, schema=ARTIFACT_SCHEMA)


DEBUG_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("stage", T.StringType()),
        T.StructField("artifact", T.BinaryType()),
    ]
)


def debug_image_bytes(media_df: DataFrame, stages: list[str] | None = None) -> DataFrame:
    """(media_ref, stage, artifact=PNG bytes) — intermediate kernel-stage
    images per payload (reference S10 debug image sink,
    `image_processor/main.py:330-398` write/writeMemory; stages include
    the K13 heatmap and K14 box overlay).

    mapInPandas keeps payloads executor-side end to end (decode ->
    stage render -> PNG encode inside one Arrow batch); undecodable
    payloads yield zero rows (the extraction pipeline, not the debug
    sink, owns quarantine reporting).
    """

    def _gen(batches):
        from ms_ocr_spark.extraction.ocr import decode_media, encode_gray
        from ms_ocr_spark.extraction.ocr.kernel import debug_stage_images
        from ms_ocr_spark.extraction.ocr.png import encode_rgb

        for pdf in batches:
            out = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    img = decode_media(bytes(payload))
                except Exception:
                    continue
                for stage, arr in debug_stage_images(img).items():
                    if stages is not None and stage not in stages:
                        continue
                    enc = encode_rgb(arr) if arr.ndim == 3 else encode_gray(arr)
                    out.append((ref, stage, enc))
            yield pd.DataFrame(out, columns=["media_ref", "stage", "artifact"])

    return media_df.select("media_ref", "payload").mapInPandas(
        _gen, schema=DEBUG_IMAGE_SCHEMA
    )
