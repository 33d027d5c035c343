"""Stateful Structured Streaming operators for the training-data path.

The reference is request/response (SURVEY.md §2.9 — no streaming), so
these are engine extensions, not parity items: the operations a
large-scale ingest pipeline runs ON ARRIVAL rather than in batch.

* `stream_dedup_first_seen` — exact content dedup across micro-batches
  and restarts: only the FIRST document per content hash is ever
  emitted.  Custom keyed state via `applyInPandasWithState` (the
  documented pattern for stateful operators Spark's built-ins cannot
  express: `dropDuplicates` on a stream has no cross-restart "emit only
  first" contract without a watermark bound, while GroupState persists
  in the checkpoint's state store indefinitely).
* `stream_windowed_event_counts` — per-window event counts with a
  watermark: late events beyond the watermark are dropped, finalized
  windows emit exactly once (append mode).

Scale: state is partitioned by the grouping key across executors (the
state store shuffles like any keyed operator); per-key state here is a
single boolean, so state size is O(distinct content hashes) bytes, the
minimum any first-seen dedup can hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("text_hash", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)

_DEDUP_STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])


def stream_dedup_first_seen(
    stream_docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Streaming exact dedup: emit each distinct `text` once, ever.

    Within a micro-batch the min id wins (deterministic); across
    micro-batches and query restarts the GroupState (a `seen` flag keyed
    by md5(text)) suppresses re-emission.  Input: a STREAMING DataFrame
    with (id_col, text_col).
    """
    hashed = stream_docs.select(
        F.md5(F.col(text_col)).alias("text_hash"),
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
    )

    def _first_seen(key, pdfs, state: GroupState):
        if state.exists:
            return  # already emitted in an earlier batch / before restart
        first = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = pdf.sort_values("doc_id").iloc[[0]]
            if first is None or cand["doc_id"].iloc[0] < first["doc_id"].iloc[0]:
                first = cand
        if first is not None:
            state.update((True,))
            yield first[["text_hash", "doc_id", "text"]]

    return hashed.groupBy("text_hash").applyInPandasWithState(
        _first_seen,
        DEDUP_OUTPUT_SCHEMA,
        _DEDUP_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def stream_windowed_event_counts(
    stream_events: DataFrame,
    ts_col: str = "ts",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window event counts with late-data handling.

    `withWatermark` bounds state: a window finalizes (and, in append
    mode, emits exactly once) when the watermark passes its end; events
    arriving later than `watermark` behind the max seen timestamp are
    dropped.  All built-in operators — the stateful bookkeeping is
    Spark's own windowed-aggregation state store.
    """
    return (
        stream_events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n_events",
        )
    )
