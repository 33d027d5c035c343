"""Incremental extraction via Structured Streaming (foreachBatch).

The reference is strictly request/response (SURVEY.md §2.9: no streaming
operators), and the north rule requires batch + checkpoint-resume — this
module is the optional incremental-ingest path: new document files landing
in a directory are extracted exactly once, reusing the batch pipeline
inside `foreachBatch` (so batch and streaming share one code path).

Exactly-once: Structured Streaming's file-source checkpoint tracks which
input files each epoch consumed; the sink appends per-epoch parquet.  A
replayed epoch after a crash rewrites the same epoch directory
(idempotent overwrite keyed on batch_id), which is the standard
foreachBatch exactly-once recipe from the Spark docs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ms_ocr_spark.extraction.pipeline import OUTPUT_SCHEMA  # noqa: F401  (public schema)
from ms_ocr_spark.extraction.pipeline import extract_documents

# Input documents share the output shape (doc_id, spans) — BASELINE.json
# input_hint; text spans carry raw HTML instead of extracted text.
INPUT_SCHEMA = OUTPUT_SCHEMA


def stream_extract(
    spark: SparkSession,
    docs_dir: str,
    media: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    schema=None,
    **extract_kw,
):
    """Watch `docs_dir` for document parquet files; extract incrementally.

    With `available_now=True` the query drains everything currently
    present and stops (the batch-catchup trigger); otherwise it runs
    continuously.  Returns the StreamingQuery.

    `schema` defaults to the canonical documents schema (input_hint shape)
    so an initially-EMPTY watch directory works — streaming sources cannot
    infer schema, and a `spark.read` probe would fail before any file
    lands.
    """
    if schema is None:
        schema = INPUT_SCHEMA
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(docs_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        out = extract_documents(batch_df, media, **extract_kw)
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch={batch_id:06d}")
        )

    writer = stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
