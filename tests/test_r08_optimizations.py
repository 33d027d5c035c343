"""Focused equivalence tests for the round-8 operator rewrites.

Every optimization this round kept the operator's OUTPUT bit-identical
while changing the execution shape (per-doc Arrow stages, per-pair /
per-bucket batch math, matrix-path greedy dedup).  The sf-data oracle
parity suite covers the common paths; these tests pin the edge cases the
testdata never exercises: NULL inputs, docs shorter than the n-gram
width, zero-area boxes, and matrix-vs-scalar path agreement.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ms_ocr_spark.operators import dedup


def test_doc_repetition_stats_edge_docs(spark):
    """Docs with < n tokens, empty and NULL text must drop out (the old
    explode semantics); counts on a known-repetition doc are exact."""
    df = spark.createDataFrame(
        [
            (1, "a b a b a"),        # grams: ab, ba, ab, ba -> all dup
            (2, "x"),                # 1 token -> no bigram -> no row
            (3, ""),                 # no tokens -> no row
            (4, None),               # null text -> no row
            (5, "p q r"),            # grams pq, qr -> no dups
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dedup.doc_repetition_stats(df, n=2).collect()}
    assert set(rows) == {1, 5}
    assert rows[1]["n_grams"] == 4
    assert rows[1]["n_distinct"] == 2
    assert rows[1]["dup_gram_frac"] == 1.0
    assert rows[1]["top_gram_frac"] == 0.5
    assert rows[5]["n_grams"] == 2
    assert rows[5]["dup_gram_frac"] == 0.0


def test_minhash_udf_matches_relational_formula(spark):
    """The Arrow signature path must equal the (retained) relational
    aggregation over the shingle relation — including short-doc drops."""
    df = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{(i * 3) % 7} tok{(i * 5) % 7} tok{i % 2} end{i % 4}")
         for i in range(40)] + [(100, "a b"), (101, None), (102, "")],
        "doc_id long, text string",
    )
    new = {
        r["doc_id"]: r["sig"]
        for r in dedup.minhash_signature_arrays_from_docs(df).collect()
    }
    old = {
        r["doc_id"]: r["sig"]
        for r in dedup.minhash_signature_arrays(dedup.shingles(df)).collect()
    }
    assert new == old
    assert 100 not in new and 101 not in new and 102 not in new


def test_jaccard_verify_edge_pairs(spark):
    """Pairs with zero shingle overlap or a too-short doc must drop out
    (the old inner-join semantics); counts are exact on a known pair."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "a b c x y"),   # shares shingle 'a b c' only
            (3, "p q r s t"),   # no overlap with 1
            (4, "u v"),         # too short for 3-shingles
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long"
    )
    out = {
        (r["id_a"], r["id_b"]): r
        for r in dedup.jaccard_verify(pairs, docs, threshold=0.0).collect()
    }
    assert set(out) == {(1, 2)}
    r = out[(1, 2)]
    assert (r["n_inter"], r["n_a"], r["n_b"]) == (1, 3, 3)
    assert r["jaccard"] == 0.2


def test_simhash_neardup_multiband_dedup_and_empty_docs(spark):
    """Identical texts match in every band; the pair must appear ONCE
    with hamming 0.  Empty/NULL docs never pair."""
    df = spark.createDataFrame(
        [(1, "same tokens here"), (2, "same tokens here"), (3, ""), (4, None),
         (5, "utterly different words appear")],
        "doc_id long, text string",
    )
    rows = dedup.simhash_near_dup_pairs(
        df, bits=32, max_hamming=3, n_bands=4
    ).collect()
    exact = [r for r in rows if (r["id_a"], r["id_b"]) == (1, 2)]
    assert len(exact) == 1 and exact[0]["hamming"] == 0
    assert all(r["id_a"] not in (3, 4) and r["id_b"] not in (3, 4) for r in rows)


def test_keep_first_matrix_equals_scalar_path(spark):
    """The matrix greedy path (groups <= 1000) must keep exactly the
    boxes the scalar fallback keeps — including zero-area boxes, which
    are always kept and never block."""
    from ms_ocr_spark.operators.boxes import dedup_overlap_keep_first

    rng = np.random.default_rng(5)
    rows = []
    for doc in range(6):
        for b in range(120):
            x1 = int(rng.integers(0, 60))
            y1 = int(rng.integers(0, 40))
            w = int(rng.integers(0, 10))  # 0 -> zero-area boxes included
            h = int(rng.integers(0, 8))
            rows.append((doc, doc * 1000 + b, x1, y1, x1 + w, y1 + h))
    df = spark.createDataFrame(
        rows, "doc_id long, box_id long, x1 long, y1 long, x2 long, y2 long"
    )
    fast = {tuple(r) for r in dedup_overlap_keep_first(df, threshold=0.5).collect()}

    # reference: the pre-round-8 scalar greedy, run per doc in pure numpy
    def scalar_keep(pdf):
        box_id = pdf["box_id"].to_numpy()
        x1, y1 = pdf["x1"].to_numpy(), pdf["y1"].to_numpy()
        x2, y2 = pdf["x2"].to_numpy(), pdf["y2"].to_numpy()
        order = np.lexsort((y2, x2, y1, x1, box_id))
        x1, y1, x2, y2 = x1[order], y1[order], x2[order], y2[order]
        area = (x2 - x1) * (y2 - y1)
        kept = []
        for i in range(len(order)):
            if kept and area[i] > 0:
                K = np.array(kept)
                ox = np.minimum(x2[i], x2[K]) - np.maximum(x1[i], x1[K])
                oy = np.minimum(y2[i], y2[K]) - np.maximum(y1[i], y1[K])
                ov = np.where((ox > 0) & (oy > 0), ox * oy, 0)
                aj = area[K]
                with np.errstate(divide="ignore", invalid="ignore"):
                    hit = (aj > 0) & (ov / area[i] > 0.5) & (ov / aj > 0.5)
                if hit.any():
                    continue
            kept.append(i)
        return pdf.iloc[order[kept]]

    pdf_all = pd.DataFrame(rows, columns=["doc_id", "box_id", "x1", "y1", "x2", "y2"])
    ref = set()
    for _, g in pdf_all.groupby("doc_id"):
        for t in scalar_keep(g).itertuples(index=False):
            ref.add(tuple(t))
    assert fast == ref


def test_brute_force_topk_null_vectors_rank_last(spark):
    """NULL corpus vectors keep the crossJoin's NULLS-LAST ranking: they
    fill trailing ranks (ordered by neighbor id) when a query has fewer
    than k scored candidates."""
    from ms_ocr_spark.operators.similarity import brute_force_topk

    def vec(seed):
        rng = np.random.default_rng(seed)
        return [float(x) for x in rng.standard_normal(64)]

    rows = [(0, vec(0)), (1, vec(1)), (2, vec(2)), (3, None), (4, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = brute_force_topk(df.filter("vec_id = 0"), df, k=4).collect()
    got = [(r["query_id"], r["neighbor_id"], r["rn"]) for r in out]
    assert len(got) == 4
    # ranks 1-2: the scored vectors; ranks 3-4: null-sim rows by id
    assert {g[1] for g in got[:2]} == {1, 2}
    assert [g[1] for g in got[2:]] == [3, 4]
    assert [r["sim"] for r in out[2:]] == [None, None]


def test_embedding_neardup_bucket_path_matches_join_path(spark):
    """The per-bucket blockwise pair generator must produce exactly the
    pairs (and 6-dp sims) of the reference bucket self-join + pairwise
    cosine, including NULL vectors never pairing."""
    from ms_ocr_spark.operators.similarity import (
        cosine_pandas,
        embedding_neardup_pairs,
        lsh_buckets_pandas,
    )

    rng = np.random.default_rng(11)
    base = rng.standard_normal((30, 64))
    rows = []
    for i in range(30):
        v = base[i % 6] + rng.standard_normal(64) * 0.2  # clustered -> shared buckets
        rows.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    rows.append((99, None))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    new = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in embedding_neardup_pairs(df, threshold=0.3).collect()
    }
    c = df.select(
        "vec_id",
        "embedding",
        lsh_buckets_pandas(8)(F.col("embedding"))[0].alias("bucket"),
    )
    a = c.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("v_a"), "bucket"
    )
    b = c.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("v_b"), "bucket"
    )
    ref = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(cosine_pandas()(F.col("v_a"), F.col("v_b")), 6))
        .filter(F.col("sim") >= 0.3)
        .select("id_a", "id_b", "sim")
        .collect()
    }
    assert new == ref
    assert all(99 not in k for k in new)


def test_component_labels_recomputes_per_invocation(spark):
    """No cross-invocation memo: a second call with DIFFERENT column args
    on the same DataFrame must reflect those args (the r7 memo returned
    the first call's labels — ADVICE r7 high finding)."""
    df = spark.createDataFrame(
        [(1, 2, 20), (2, 3, 30)], "id_a long, id_b long, other long"
    )
    l1 = {
        (r["id"], r["component"])
        for r in dedup.component_labels(df, "id_a", "id_b").collect()
    }
    l2 = {
        (r["id"], r["component"])
        for r in dedup.component_labels(df, "id_a", "other").collect()
    }
    assert l1 == {(1, 1), (2, 1), (3, 1)}
    assert l2 == {(1, 1), (20, 1), (2, 2), (30, 2)}
