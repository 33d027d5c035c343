"""PDF text extraction source (north_rule 'PDF/layout parse').

A minimal but real parser for the text layer of PDF files: object scan,
FlateDecode content streams (stdlib zlib), and the standard text-showing
operator subset — `BT`/`ET` text blocks, `Tm` (text matrix — e/f
translation consumed), `Td`/`TD` (line translation), `Tj`, `'` and the
array form `TJ`, with PDF string escapes.  Covers the engine's own sink
dialect (`operators/sinks.py::pdf_from_boxes`) and any single-content-
stream PDF using those operators; anything unparsable raises ValueError
so the pipeline's quarantine catch applies.

This is a SOURCE: the reference service only ever renders PDF overlays
out; the north rule's extraction mandate ("HTML boilerplate strip,
PDF/layout parse, DOM heuristics") makes the inverse direction —
positioned text spans back OUT of PDF bytes — a first-class input path.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+) 0 obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_STREAM_KW_RE = re.compile(rb"stream(?:\r\n|\n)")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?![ \t]+\d+[ \t]+R)")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+0\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.S)
_REF_RE = re.compile(rb"(\d+)\s+0\s+R")


def _pdf_objects(data: bytes) -> dict[int, bytes]:
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF")
    return {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(data)}


def _content_stream(body: bytes) -> bytes | None:
    # Prefer slicing by the dictionary's direct /Length value: a regex scan
    # for "endstream" can truncate inside binary stream data (or eat a real
    # trailing 0x0D byte via the optional \r).  Fall back to the regex only
    # when /Length is absent or an indirect reference.
    raw = None
    lm = _LENGTH_RE.search(body)
    km = _STREAM_KW_RE.search(body)
    if lm and km:
        start = km.end()
        raw = body[start : start + int(lm.group(1))]
    if raw is None:
        m = _STREAM_RE.search(body)
        if not m:
            return None
        raw = m.group(1)
    if b"/FlateDecode" in body:
        return zlib.decompress(raw)
    return raw


def _unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt in "nrtbf":
                out.append({"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f"}[nxt])
                i += 2
                continue
            if nxt in "\\()":
                out.append(nxt)
                i += 2
                continue
            if nxt.isdigit():  # octal escape, 1-3 digits
                j = i + 1
                while j < min(i + 4, len(s)) and s[j].isdigit():
                    j += 1
                out.append(chr(int(s[i + 1 : j], 8)))
                i = j
                continue
            if nxt in "\r\n":  # line continuation: drop backslash + EOL
                i += 2
                if nxt == "\r" and i < len(s) and s[i] == "\n":
                    i += 1
                continue
            # PDF 7.3.4.2: an unrecognized escape drops the backslash and
            # keeps the following character.
            out.append(nxt)
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


_TOKEN_RE = re.compile(
    r"""\((?:[^()\\]|\\.)*\)   # literal string (with escapes)
      | \[ | \]
      | [-+]?\d*\.?\d+         # number
      | /[A-Za-z0-9#._-]+      # name
      | [A-Za-z'"*]+           # operator
    """,
    re.X,
)


def _extract_from_stream(content: bytes, page: int) -> list[tuple]:
    """One content stream -> [(page, x, y, text)] in drawing order."""
    text = content.decode("latin-1", "replace")
    spans: list[tuple] = []
    stack: list = []
    x = y = 0.0
    in_text = False
    for m in _TOKEN_RE.finditer(text):
        tok = m.group(0)
        if tok == "BT":
            in_text, x, y = True, 0.0, 0.0
            stack = []
        elif tok == "ET":
            in_text = False
            stack = []
        elif not in_text:
            continue
        elif tok.startswith("("):
            stack.append(("s", _unescape(tok[1:-1])))
        elif tok in ("[", "]"):
            continue  # TJ arrays: strings concatenate, kerning numbers drop
        elif re.fullmatch(r"[-+]?\d*\.?\d+", tok):
            stack.append(("n", float(tok)))
        elif tok == "Tm":
            nums = [v for k, v in stack if k == "n"][-6:]
            if len(nums) == 6:
                x, y = nums[4], nums[5]
            stack = []
        elif tok in ("Td", "TD"):
            nums = [v for k, v in stack if k == "n"][-2:]
            if len(nums) == 2:
                x, y = x + nums[0], y + nums[1]
            stack = []
        elif tok in ("Tj", "'"):
            strs = [v for k, v in stack if k == "s"]
            if strs:
                spans.append((page, round(x, 1), round(y, 1), strs[-1]))
            stack = []
        elif tok == "TJ":
            strs = [v for k, v in stack if k == "s"]
            if strs:
                spans.append((page, round(x, 1), round(y, 1), "".join(strs)))
            stack = []
        else:  # Tf, Tc, Tw, colors, ... consume operands
            stack = []
    return spans


def pdf_text_spans(data: bytes) -> list[tuple]:
    """PDF bytes -> [(page, x, y, text)] spans in page + drawing order.

    Pages resolve through the /Pages tree's /Kids order; each page's
    /Contents stream is parsed independently.  PDFs without a parseable
    page tree fall back to scanning every stream object in object order
    (tolerant mode for linearized/cut files)."""
    objs = _pdf_objects(data)
    page_contents: list[int] = []
    kids_order: list[int] = []
    for _num, body in sorted(objs.items()):
        if b"/Type /Pages" in body or b"/Type/Pages" in body:
            m = _KIDS_RE.search(body)
            if m:
                kids_order = [int(r.group(1)) for r in _REF_RE.finditer(m.group(1))]
    for kid in kids_order:
        body = objs.get(kid, b"")
        m = _CONTENTS_RE.search(body)
        if m:
            page_contents.append(int(m.group(1)))
    spans: list[tuple] = []
    if page_contents:
        for page, cnum in enumerate(page_contents):
            content = _content_stream(objs.get(cnum, b""))
            if content is not None:
                spans.extend(_extract_from_stream(content, page))
    else:  # tolerant fallback: every stream in object order on page 0
        for _num, body in sorted(objs.items()):
            content = _content_stream(body)
            if content is not None:
                spans.extend(_extract_from_stream(content, 0))
    if not spans:
        raise ValueError("no text spans found in PDF")
    return spans


def pdf_extract_spans_df(artifacts, id_col: str = "doc_id", payload_col: str = "artifact"):
    """DataFrame operator: (id, pdf bytes) -> one row per text span
    (id, page, x, y, text).  Same mapInPandas shape as the other binary
    media paths — PDF bytes stream through Arrow batches executor-side;
    unparsable payloads yield a single all-null row (quarantine
    contract), never a task failure."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(id_col, T.StringType()),
            T.StructField("page", T.IntegerType()),
            T.StructField("x", T.DoubleType()),
            T.StructField("y", T.DoubleType()),
            T.StructField("text", T.StringType()),
        ]
    )

    def _gen(batches):
        for pdf in batches:
            rows = []
            for did, buf in zip(pdf[id_col], pdf[payload_col]):
                try:
                    for page, x, y, text in pdf_text_spans(bytes(buf)):
                        rows.append((str(did), page, x, y, text))
                except Exception:
                    rows.append((str(did), None, None, None, None))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return artifacts.select(id_col, payload_col).mapInPandas(_gen, schema=schema)
