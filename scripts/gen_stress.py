#!/usr/bin/env python
"""Round-8 stress dataset: reproduce the driver's sf1.0 cost profile.

/root/testdata tops out at sf0.1 (5k docs / 2k embeddings / 600k
lineitem) while the driver measures at sf1.0, where the slow queries are
super-linear (candidate-pair blowups).  This script synthesizes a
10x dataset with the same shapes:

  * documents: 50k rows drawn from sf0.1's empirical token-frequency and
    length distributions; ~3% near-duplicates (copy an earlier doc,
    mutate 0-2 tokens) so dedup candidate structure is realistic.
  * embeddings: 20k unit-norm 64-d vectors, ~3% near-dup pairs.
  * lineitem / events: sf0.1 replicated 10x with shifted keys
    (l_orderkey / event_id / user_id offsets) so the box- and
    window-query families scale too.
  * other tables: symlinks to sf0.1 (dimension-sized, never hot).

Validated proxy: round-7 code measured 57.9 s on simhash_neardup_pairs
here vs the driver's 56.2 s at sf1.0, 22.4 s vs 22.9 s on
ann_brute_force_topk, 11.5 s vs 13.1 s on dedup_boxes_keep_first.

Usage: python scripts/gen_stress.py [outdir]   (default /root/stress/sf1like)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def main(out: str = "/root/stress/sf1like") -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(8)
    con = duckdb.connect()
    freq_rows = con.sql(
        f"with toks as (select unnest(string_split(lower(text),' ')) t "
        f"from read_parquet('{SRC}/documents.parquet')) "
        "select t, count(*) c from toks group by t order by c desc"
    ).fetchall()
    toks = [r[0] for r in freq_rows]
    p = np.array([r[1] for r in freq_rows], dtype=float)
    p /= p.sum()
    n = 50_000
    langs = ["en", "en", "en", "fr", "de", "zh", "ja"]
    texts: list[str] = []
    for i in range(n):
        if i > 100 and rng.random() < 0.03:
            base = texts[rng.integers(0, i - 1)].split(" ")
            for _ in range(rng.integers(0, 3)):
                base[rng.integers(0, len(base))] = toks[rng.integers(0, len(toks))]
            texts.append(" ".join(base))
        else:
            texts.append(" ".join(rng.choice(toks, size=rng.integers(10, 101), p=p)))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array([langs[i % len(langs)] for i in range(n)]),
                "source": pa.array([f"src{i % 20}" for i in range(n)]),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        f"{out}/documents.parquet",
    )
    m = 20_000
    E = rng.standard_normal((m, 64))
    for _ in range(int(m * 0.03)):
        a, b = rng.integers(0, m), rng.integers(0, m)
        E[b] = E[a] + rng.standard_normal(64) * 0.05
    E /= np.linalg.norm(E, axis=1, keepdims=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(m), pa.int64()),
                "embedding": pa.array(
                    [row.astype(np.float32).tolist() for row in E],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([f"l{i % 10}" for i in range(m)]),
            }
        ),
        f"{out}/embeddings.parquet",
    )
    mx = con.sql(
        f"select max(l_orderkey) from read_parquet('{SRC}/lineitem.parquet')"
    ).fetchone()[0]
    off = (mx // 1000 + 1) * 1000
    con.execute(
        f"COPY (SELECT * REPLACE (l_orderkey + g.i * {off} AS l_orderkey) "
        f"FROM read_parquet('{SRC}/lineitem.parquet'), generate_series(0, 9) g(i)) "
        f"TO '{out}/lineitem.parquet' (FORMAT PARQUET)"
    )
    mu = con.sql(
        f"select max(user_id), max(event_id) from read_parquet('{SRC}/events.parquet')"
    ).fetchone()
    con.execute(
        f"COPY (SELECT * REPLACE (event_id + g.i * {(mu[1] // 1000 + 1) * 1000} "
        f"AS event_id, user_id + g.i * {(mu[0] // 100 + 1) * 100} AS user_id) "
        f"FROM read_parquet('{SRC}/events.parquet'), generate_series(0, 9) g(i)) "
        f"TO '{out}/events.parquet' (FORMAT PARQUET)"
    )
    for t in ("region", "nation", "customer", "supplier", "part", "orders"):
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    print(f"stress dataset ready: {out}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
