"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; random-hyperplane LSH
bucketing as the scale path (buckets shrink the candidate set ~2^planes).
Dot products run as sequential left-folds (zip_with + aggregate) so the
floating-point result is bit-identical to the DuckDB oracle's
list_reduce(list_transform(...)) — same operation order.

Scale notes: brute force is a broadcast-join of the (small) query set
against the corpus — O(Q*N) but embarrassingly parallel with no shuffle
beyond the final per-query top-k; LSH replaces the N side with one
bucket's worth of rows via an equi-join on the bucket key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ms_ocr_spark.functions.hashing import md5_long, plane_weights
from ms_ocr_spark.plans.cache import track

from .windows import top_k_per_group


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic FP order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_pandas(dim: int = 64):
    """Arrow-batched pandas cosine — bit-identical to `cosine`'s folds.

    dot and the two squared norms accumulate dimension-by-dimension
    across the batch (same IEEE-double op order per row as the
    sequential folds), then one vectorized sqrt/divide.  Used on the
    brute-force path where the cross join evaluates O(Q*N) cosines and
    the per-element HOF interpreter cost dominates; bucket-join paths
    score few candidates and keep the column-expression form.
    """

    @F.pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        # NULL vectors on either side yield NULL sim (matches the column
        # expression's propagation); compute only on the valid rows so a
        # ragged object array never reaches numpy.
        valid = a.notna() & b.notna()
        out = pd.Series([None] * len(a), index=a.index, dtype=object)
        if not bool(valid.any()):
            return out
        A = np.array(a[valid].tolist(), dtype=np.float64).reshape(-1, dim)
        B = np.array(b[valid].tolist(), dtype=np.float64).reshape(-1, dim)
        dot_ = np.zeros(len(A))
        na = np.zeros(len(A))
        nb = np.zeros(len(A))
        for i in range(dim):
            dot_ += A[:, i] * B[:, i]
            na += A[:, i] * A[:, i]
            nb += B[:, i] * B[:, i]
        out.loc[valid] = (dot_ / (np.sqrt(na) * np.sqrt(nb))).tolist()
        return out

    return _cos


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
) -> DataFrame:
    """Exact cosine top-k: every query scored against every corpus vector,
    per-query row_number <= k, ties broken by neighbor id.

    Round 8 (guide §4.2/§8): the former crossJoin shipped BOTH 64-float
    vectors of every (query, corpus) pair through Arrow — Q x N x 1 KB —
    just so a pairwise UDF could re-read the same query vectors millions
    of times.  Now the (small, bounded — same assumption the previous
    broadcast made) query matrix rides once in the task closure and one
    mapInPandas pass over the CORPUS scores each Arrow batch against all
    queries at once with the identical per-dimension accumulation order
    as `cosine_pandas`/`cosine` (bit-identical doubles).  Each batch is
    pre-pruned to a provable superset of the global top-k: a candidate
    whose unrounded sim is more than 1.1e-6 below its batch's k-th best
    cannot survive 6-dp rounding (|round(x) - x| <= 5e-7), so the exact
    JVM round + window ranking runs over ~Q*k rows per batch instead of
    Q x N.  NULL vectors keep their former ranking semantics: null-sim
    candidate rows are emitted (pruned to the k smallest neighbor ids,
    their tie-break order) and rank below every scored row in the
    NULLS-LAST window, exactly as the crossJoin produced them.
    """
    import numpy as np
    import pandas as pd

    qpd = queries.select(id_col, vec_col).toPandas()
    q_ids = qpd[id_col].to_numpy()
    q_valid = np.array([v is not None for v in qpd[vec_col]])
    Qm = (
        np.array(
            [np.asarray(v, dtype=np.float64) for v in qpd[vec_col][q_valid]]
        ).reshape(-1, dim)
        if q_valid.any()
        else np.zeros((0, dim))
    )
    vq_ids = q_ids[q_valid]
    nq_ids = q_ids[~q_valid]
    qn = np.zeros(len(Qm))
    for i in range(dim):
        qn += Qm[:, i] * Qm[:, i]
    qn = np.sqrt(qn)
    id_type = corpus.schema[id_col].dataType.simpleString()
    schema = f"query_id {id_type}, neighbor_id {id_type}, sim double"

    def _score(batches):
        for pdf in batches:
            c_ids = pdf[id_col].to_numpy()
            valid = np.array([v is not None for v in pdf[vec_col]])
            out_q, out_n, out_s = [], [], []
            if valid.any() and len(Qm):
                C = np.array(
                    [np.asarray(v, np.float64) for v in pdf[vec_col][valid]]
                ).reshape(-1, dim)
                cid = c_ids[valid]
                m = len(C)
                dot = np.zeros((len(Qm), m))
                cn = np.zeros(m)
                for i in range(dim):
                    # same IEEE accumulation order per element as the folds
                    dot += Qm[:, i : i + 1] * C[:, i][None, :]
                    cn += C[:, i] * C[:, i]
                sim = dot / (qn[:, None] * np.sqrt(cn)[None, :])
                self_mask = cid[None, :] == vq_ids[:, None]
                sim_rank = np.where(self_mask, -np.inf, sim)
                if m > k:
                    kth = np.partition(sim_rank, m - k, axis=1)[:, m - k]
                    keep = (sim_rank >= kth[:, None] - 1.1e-6) & ~self_mask
                else:
                    keep = ~self_mask
                qi, ci = np.nonzero(keep)
                out_q.append(vq_ids[qi])
                out_n.append(cid[ci])
                out_s.append(sim[qi, ci])
            res = pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q) if out_q else [],
                    "neighbor_id": np.concatenate(out_n) if out_n else [],
                    "sim": np.concatenate(out_s) if out_s else [],
                }
            )
            # null-sim rows: null corpus vectors against every query, and
            # every corpus vector against null queries — k smallest
            # neighbor ids per query per batch is a superset of their
            # possible global ranks (ties order by neighbor_id)
            null_parts = []
            if (~valid).any():
                nn = np.sort(c_ids[~valid])
                for qid in q_ids:
                    take = [K for K in nn[: k + 1] if K != qid][:k]
                    null_parts.append(
                        pd.DataFrame(
                            {"query_id": qid, "neighbor_id": take, "sim": None}
                        )
                    )
            if len(nq_ids) and valid.any():
                vv = np.sort(c_ids[valid])
                for qid in nq_ids:
                    take = [K for K in vv[: k + 1] if K != qid][:k]
                    null_parts.append(
                        pd.DataFrame(
                            {"query_id": qid, "neighbor_id": take, "sim": None}
                        )
                    )
            if null_parts:
                res = pd.concat([res] + null_parts, ignore_index=True)
            yield res

    scored = corpus.select(id_col, vec_col).mapInPandas(_score, schema)
    return top_k_per_group(
        scored.select(
            "query_id", "neighbor_id", F.round("sim", 6).alias("sim")
        ),
        ["query_id"],
        [F.col("sim").desc(), F.col("neighbor_id").asc()],
        k,
    )


def lsh_bucket(vec: Column, n_planes: int = 8, dim: int = 64, table: int = 0) -> Column:
    """Bucket id = packed sign bits of n_planes ±1 random hyperplanes.

    Weights come from `plane_weights` (md5 parity, computed once on the
    driver, embedded as array literals) so the DuckDB oracle assigns the
    exact same buckets.  Each plane's projection is a sequential fold —
    deterministic FP order.  `table` picks an independent plane set for
    multi-table OR-amplification.

    Kept as per-plane scalar folds DELIBERATELY: a one-traversal variant
    with an array accumulator (all tables x planes summed through one
    zip_with/transform) produces bit-identical buckets and compiles
    faster, but higher-order functions are CodegenFallback expressions
    with no common-subexpression elimination — every reference to the
    result array re-evaluates the whole fold, and the 3-table query
    measured ~2.4x SLOWER end-to-end (13 s vs 5.5 s at sf0.1).  Scalar
    folds are referenced exactly once each, so the work stays
    planes x dim.
    """
    weights = plane_weights(n_planes, dim, table)
    bucket = F.lit(0)
    for p in range(n_planes):
        w = F.array(*[F.lit(v) for v in weights[p]])
        proj = F.aggregate(
            F.zip_with(vec, w, lambda x, wv: x.cast("double") * wv),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_buckets_all(
    vec: Column, n_planes: int = 8, dim: int = 64, tables: tuple[int, ...] = (0,)
) -> Column:
    """Array of per-table bucket ids (see `lsh_bucket` for why these are
    independent scalar folds rather than one shared array traversal)."""
    return F.array(*[lsh_bucket(vec, n_planes, dim, t) for t in tables])


def lsh_buckets_pandas(
    n_planes: int = 8, dim: int = 64, tables: tuple[int, ...] = (0,)
):
    """Arrow-batched pandas UDF computing all per-table bucket ids —
    BIT-IDENTICAL to `lsh_bucket`'s folds, ~20x cheaper per row.

    The JVM fold pays interpreted higher-order-function overhead per
    vector element per plane (tables x planes x dim lambda calls per
    row).  Here the projection accumulates dimension-by-dimension across
    the whole Arrow batch: `acc[:, p] += x_i * w_p_i` performs, for each
    (row, plane), the same IEEE-double additions in the same index order
    starting from 0.0 as the sequential fold — so bucket assignment (and
    the DuckDB oracle parity that rides on it) is preserved exactly,
    while the per-element interpreter cost vanishes into numpy.
    This is the hot path for bucket computation; `lsh_bucket` remains
    the column-expression form (used by the oracle-SQL mirror and as the
    executable definition the equality test pins the UDF against).
    """
    # dim x (tables*planes) weight matrix, column order = (table, plane)
    by_table = [plane_weights(n_planes, dim, t) for t in tables]
    w = np.array(
        [
            [by_table[ti][p][i] for ti in range(len(tables)) for p in range(n_planes)]
            for i in range(dim)
        ],
        dtype=np.float64,
    )
    n_proj = len(tables) * n_planes
    pows = np.array([1 << p for p in range(n_planes)], dtype=np.int64)

    @F.pandas_udf("array<int>")
    def _buckets(emb: pd.Series) -> pd.Series:
        valid = emb.notna()
        if not bool(valid.any()):
            # an all-NULL Arrow batch: tolist() would yield a 1-D empty
            # array and X[:, i:i+1] would raise — short-circuit to NULLs
            return pd.Series([None] * len(emb), index=emb.index, dtype=object)
        X = np.array(emb[valid].tolist(), dtype=np.float64).reshape(-1, dim)
        acc = np.zeros((len(X), n_proj), dtype=np.float64)
        for i in range(dim):
            # same op sequence per (row, plane) as the sequential fold
            acc += X[:, i : i + 1] * w[i][None, :]
        signs = acc > 0
        buckets = np.stack(
            [
                signs[:, ti * n_planes : (ti + 1) * n_planes] @ pows
                for ti in range(len(tables))
            ],
            axis=1,
        )
        out = pd.Series([None] * len(emb), index=emb.index, dtype=object)
        out.loc[valid] = pd.Series(
            [[int(v) for v in row] for row in buckets],
            index=emb.index[valid],
            dtype=object,
        )
        return out

    return _buckets


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: only candidates in the query's LSH bucket are
    scored.  Equi-join on bucket -> per-query top-k; recall trades off
    against 2^n_planes."""
    buckets = lsh_buckets_pandas(n_planes)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        buckets(F.col(vec_col))[0].alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        buckets(F.col(vec_col))[0].alias("bucket"),
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.round(cosine_pandas()(F.col("q_vec"), F.col("c_vec")), 6))
    )
    return top_k_per_group(
        scored.select("query_id", "neighbor_id", "sim"),
        ["query_id"],
        [F.col("sim").desc(), F.col("neighbor_id").asc()],
        k,
    )


def lsh_topk_multitable(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 3,
) -> DataFrame:
    """OR-amplified approximate top-k: candidates match in ANY of
    `n_tables` independent LSH tables (recall grows ~1-(1-p^planes)^tables
    while each join stays a bucket equi-join).

    ONE scan of each side: all table buckets are computed as an array and
    posexploded, so the join key is (table, bucket) — no per-table rescan.

    Shuffle width: the exploded relations carry ONLY (id, tbl, bucket) —
    never the embedding vectors.  Carrying both 64-float vectors through
    the n_tables-times-exploded join would multiply candidate shuffle rows
    to ~1 KB each and shuffle them AGAIN through the dedup; instead the
    candidate (query_id, neighbor_id) id pairs are deduped first and the
    vectors re-attached by two id equi-joins for scoring — the same shape
    the DuckDB oracle uses.
    """
    buckets = lsh_buckets_pandas(n_planes, tables=tuple(range(n_tables)))

    def bucket_keys(df: DataFrame, out_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.posexplode(buckets(F.col(vec_col))).alias("tbl", "bucket"),
        )

    cand = (
        bucket_keys(queries, "query_id")
        .join(bucket_keys(corpus, "neighbor_id"), ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    q_vecs = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c_vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        cand.join(q_vecs, "query_id")
        .join(c_vecs, "neighbor_id")
        .withColumn("sim", F.round(cosine_pandas()(F.col("q_vec"), F.col("c_vec")), 6))
    )
    return top_k_per_group(
        scored.select("query_id", "neighbor_id", "sim"),
        ["query_id"],
        [F.col("sim").desc(), F.col("neighbor_id").asc()],
        k,
    )


def ivf_cell_assignments(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    top_cells: int,
    dim: int = 64,
) -> DataFrame:
    """(id, cell) for the `top_cells` nearest centroids by dot product
    (ties broken by cell id).  The inverted-file coarse quantizer is tiny
    by construction, so it travels in the task closure (round 8 — the
    broadcast nested-loop + interpreted JVM fold evaluated
    |vectors| x |cells| x dim lambda calls and then ranked the full
    |vectors| x |cells| relation through a window; guide §4.2).  One
    Arrow pass over the vectors scores all cells per batch with the
    fold's exact per-dimension accumulation order, ranks the handful of
    cells per vector in-process with the identical (d DESC, cell ASC)
    total order, and emits only the `top_cells` winning rows — the
    window disappears entirely.  NULL vectors keep the former
    NULLS-LAST row_number semantics (cells 0..top_cells-1)."""
    import numpy as np
    import pandas as pd

    cpd = centroids.toPandas()
    cells = cpd["cell"].to_numpy()
    order = np.argsort(cells, kind="stable")
    cells = cells[order]
    CENT = np.array(
        [np.asarray(v, np.float64) for v in cpd["cent_vec"].to_numpy()[order]]
    ).reshape(-1, dim)
    n_cells = len(cells)
    id_type = vectors.schema[id_col].dataType.simpleString()

    def _assign(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            valid = np.array([v is not None for v in pdf[vec_col]])
            out_i, out_c = [], []
            if valid.any() and n_cells:
                X = np.array(
                    [np.asarray(v, np.float64) for v in pdf[vec_col][valid]]
                ).reshape(-1, dim)
                d = np.zeros((len(X), n_cells))
                for i in range(dim):
                    # same IEEE accumulation order per element as `dot`
                    d += X[:, i : i + 1] * CENT[:, i][None, :]
                # rank (d DESC, cell ASC): cells are sorted ascending, so
                # a stable argsort on -d preserves the cell tie-break
                rk = np.argsort(-d, axis=1, kind="stable")[:, :top_cells]
                out_i.append(np.repeat(ids[valid], rk.shape[1]))
                out_c.append(cells[rk].ravel())
            if (~valid).any() and n_cells:
                t = min(top_cells, n_cells)
                out_i.append(np.repeat(ids[~valid], t))
                out_c.append(np.tile(cells[:t], (~valid).sum()))
            yield pd.DataFrame(
                {
                    id_col: np.concatenate(out_i) if out_i else [],
                    "cell": np.concatenate(out_c) if out_c else [],
                }
            )

    return vectors.select(id_col, vec_col).mapInPandas(
        _assign, f"{id_col} {id_type}, cell int"
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-flat approximate top-k: corpus vectors are assigned to the
    nearest of `n_cells` centroids (inverted file); a query scores only
    the vectors in its `nprobe` nearest cells.

    Deterministic variant: centroids are the `n_cells` corpus vectors
    with the smallest md5('ivf:'||id) — a seeded sample standing in for
    k-means training (which is engine-nondeterministic), so the DuckDB
    oracle assigns the exact same cells.  Recall grows with nprobe while
    each search stays one broadcast quantizer pass + one cell equi-join —
    the classic IVF scale shape (Johnson et al., "Billion-scale
    similarity search with GPUs", the FAISS IVF-flat design).
    """
    seeded = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        md5_long(F.concat(F.lit("ivf:"), F.col(id_col).cast("string"))).alias("h"),
    )
    cents = (
        seeded.orderBy("h", id_col)
        .limit(n_cells)
        .withColumn(
            "cell",
            (F.row_number().over(Window.orderBy("h", id_col)) - 1).cast("int"),
        )
        .select("cell", F.col(vec_col).alias("cent_vec"))
    )
    c_cells = ivf_cell_assignments(corpus, cents, id_col, vec_col, 1)
    q_cells = ivf_cell_assignments(queries, cents, id_col, vec_col, nprobe)
    cand = (
        q_cells.withColumnRenamed(id_col, "query_id")
        .join(c_cells.withColumnRenamed(id_col, "neighbor_id"), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )
    q_vecs = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c_vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        cand.join(q_vecs, "query_id")
        .join(c_vecs, "neighbor_id")
        .withColumn("sim", F.round(cosine_pandas()(F.col("q_vec"), F.col("c_vec")), 6))
    )
    return top_k_per_group(
        scored.select("query_id", "neighbor_id", "sim"),
        ["query_id"],
        [F.col("sim").desc(), F.col("neighbor_id").asc()],
        k,
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold, LSH-bucket prefiltered
    (pairs in different buckets are never compared — documented recall
    tradeoff, same bucketing as the oracle).

    Round 8 (guide §2.3/§4.2): the former bucket self-join materialized
    every candidate pair WITH both 64-float vectors attached and shipped
    them through Arrow to a pairwise cosine UDF — ~1 KB per candidate.
    Now each bucket's vectors cross the boundary once: groupBy(bucket) +
    applyInPandas computes the in-bucket pairwise cosines blockwise in
    numpy with the exact per-dimension accumulation order of the
    `cosine` fold (bit-identical doubles), pre-filters with a
    conservative margin (round6(x) >= threshold requires
    x >= threshold - 5e-7), and the exact 6-dp round + threshold run in
    the JVM as before.  Pair orientation (id_a < id_b on raw ids), NULL
    vectors (never compared) and NULL buckets (never joined) behave
    identically.  Block size bounds memory to block x |bucket| doubles,
    so a pathologically hot bucket degrades gracefully instead of
    allocating |bucket|^2 at once.
    """
    import numpy as np

    buckets = lsh_buckets_pandas(n_planes).asNondeterministic()
    c = corpus.select(
        id_col, vec_col, buckets(F.col(vec_col))[0].alias("bucket")
    ).filter(F.col("bucket").isNotNull())
    id_type = corpus.schema[id_col].dataType.simpleString()
    lo = threshold - 1e-6
    block = 1024

    def _pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        valid = np.array([v is not None for v in pdf[vec_col]])
        ids = pdf[id_col].to_numpy()[valid]
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "sim": []})
        order = np.argsort(ids)
        ids = ids[order]
        X = np.array(
            [np.asarray(v, np.float64) for v in pdf[vec_col][valid]]
        ).reshape(-1, dim)[order]
        m = len(X)
        nrm = np.zeros(m)
        for i in range(dim):
            nrm += X[:, i] * X[:, i]
        nrm = np.sqrt(nrm)
        out_a, out_b, out_s = [], [], []
        for b0 in range(0, m - 1, block):
            b1 = min(b0 + block, m)
            dot = np.zeros((b1 - b0, m))
            for i in range(dim):
                # same IEEE accumulation order per element as the folds
                dot += X[b0:b1, i : i + 1] * X[:, i][None, :]
            sim = dot / (nrm[b0:b1, None] * nrm[None, :])
            ri, cj = np.nonzero(sim >= lo)
            # strict id comparison, exactly the join's id_a < id_b — on
            # the id-sorted layout this is the upper triangle, and rows
            # sharing an id (if any) never pair, matching the join
            upper = ids[cj] > ids[ri + b0]
            ri, cj = ri[upper], cj[upper]
            out_a.append(ids[ri + b0])
            out_b.append(ids[cj])
            out_s.append(sim[ri, cj])
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a) if out_a else [],
                "id_b": np.concatenate(out_b) if out_b else [],
                "sim": np.concatenate(out_s) if out_s else [],
            }
        )

    out = c.groupBy("bucket").applyInPandas(
        _pairs, schema=f"id_a {id_type}, id_b {id_type}, sim double"
    )
    return (
        out.select("id_a", "id_b", F.round("sim", 6).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )
