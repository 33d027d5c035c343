"""Property test: the relational grid/merge/matrix operators equal a
straight-line Python reimplementation of the reference's DataToTable
loops (`/root/reference/src/library/data_to_table/main.py:177-287`) on
randomized box sets — not just on the well-behaved synthetic tables."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ms_ocr_spark.operators.tables import detect_merges, grid_from_boxes, table_cells

TOL_Y, TOL_X = 10, 15


def _ref_cluster(pos: list[float], tol: float) -> list[int]:
    """Reference `_clusterPosition` (`data_to_table/main.py:256-272`)."""
    out = [0] * len(pos)
    order = np.argsort(pos, kind="stable")
    vals = np.array(pos)[order]
    out[order[0]] = 0
    count = 0
    for a in range(1, len(vals)):
        if vals[a] - vals[a - 1] > tol:
            count += 1
        out[order[a]] = count
    return out


def _ref_table(rows: list[dict]) -> dict[tuple[int, int], dict]:
    """Straight-line twin of _detectGrid + _detectCellMerge +
    _buildDataFrame (positions = mean top/left per cluster; spans extend
    while the far edge passes the next position + tol; covered non-origin
    positions skipped; multi-hit ' '-joined in (y1, x1) order)."""
    cells = sorted(rows, key=lambda c: (c["y1"], c["x1"]))
    row_idx = _ref_cluster([c["y1"] for c in cells], TOL_Y)
    col_idx = _ref_cluster([c["x1"] for c in cells], TOL_X)
    n_rows, n_cols = max(row_idx) + 1, max(col_idx) + 1
    row_pos = [
        np.mean([c["y1"] for c, r in zip(cells, row_idx) if r == a]) for a in range(n_rows)
    ]
    col_pos = [
        np.mean([c["x1"] for c, cc in zip(cells, col_idx) if cc == a]) for a in range(n_cols)
    ]
    spans = []
    for i, c in enumerate(cells):
        re_ = row_idx[i]
        for a in range(row_idx[i] + 1, n_rows):
            if c["y2"] > row_pos[a] + TOL_Y:
                re_ = a
            else:
                break
        ce = col_idx[i]
        for a in range(col_idx[i] + 1, n_cols):
            if c["x2"] > col_pos[a] + TOL_X:
                ce = a
            else:
                break
        spans.append((re_, ce))
    covered = set()
    for i in range(len(cells)):
        r0, c0 = row_idx[i], col_idx[i]
        for a in range(r0, spans[i][0] + 1):
            for b in range(c0, spans[i][1] + 1):
                if (a, b) != (r0, c0):
                    covered.add((a, b))
    out: dict[tuple[int, int], dict] = {}
    for i, c in enumerate(cells):  # cells already in (y1, x1) fill order
        key = (row_idx[i], col_idx[i])
        if key in covered:
            continue
        if key in out:
            out[key]["cell_text"] += " " + c["text"]
            out[key]["n_texts"] += 1
            out[key]["row_span"] = max(out[key]["row_span"], spans[i][0] - key[0] + 1)
            out[key]["col_span"] = max(out[key]["col_span"], spans[i][1] - key[1] + 1)
        else:
            out[key] = {
                "cell_text": c["text"],
                "row_span": spans[i][0] - key[0] + 1,
                "col_span": spans[i][1] - key[1] + 1,
                "n_texts": 1,
            }
    return out


def test_table_ops_match_reference_twin_on_random_grids(spark):
    rng = np.random.default_rng(23)
    rows = []
    for doc in range(20):
        n = int(rng.integers(4, 16))
        for i in range(n):
            # anchor near a loose grid with jitter; sizes vary enough to
            # produce accidental spans and multi-hit cells
            x1 = int(rng.integers(0, 5) * 60 + rng.integers(0, 12))
            y1 = int(rng.integers(0, 5) * 35 + rng.integers(0, 8))
            rows.append(
                {
                    "doc_id": doc,
                    "box_id": i,
                    "x1": x1,
                    "y1": y1,
                    "x2": x1 + int(rng.integers(10, 130)),
                    "y2": y1 + int(rng.integers(8, 70)),
                    "text": f"t{doc}_{i}",
                }
            )
    df = spark.createDataFrame(pd.DataFrame(rows)).select(
        "doc_id", "box_id", "x1", "y1", "x2", "y2", "text"
    )
    got = table_cells(detect_merges(grid_from_boxes(df))).toPandas()
    for doc in range(20):
        doc_rows = [r for r in rows if r["doc_id"] == doc]
        want = _ref_table(doc_rows)
        g = got[got.doc_id == doc]
        got_map = {
            (int(r.row_idx), int(r.col_idx)): (
                r.cell_text,
                int(r.row_span),
                int(r.col_span),
                int(r.n_texts),
            )
            for r in g.itertuples()
        }
        want_map = {
            k: (v["cell_text"], v["row_span"], v["col_span"], v["n_texts"])
            for k, v in want.items()
        }
        assert got_map == want_map, f"doc {doc}:\n got {got_map}\nwant {want_map}"
