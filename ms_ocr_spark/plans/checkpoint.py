"""Per-partition-range checkpoint commits with lineage + metrics tables.

North rule: "per-partition checkpoint commits to Iceberg with lineage +
extraction-metrics side tables so any failed partition range is resumable".
The sandbox has no Iceberg catalog jars, so the commit unit here is an
overwrite of one bucket directory + an atomic lineage marker — the same
idempotence contract as an Iceberg `overwritePartitions()`; swap `_write_
bucket` for `writeTo(table).overwritePartitions()` on a real catalog.

Resume semantics (exactly-once):
  1. bucket data is written (overwrite -> idempotent on retry)
  2. ONLY THEN the lineage row for (job_id, bucket) is committed
  3. resume skips buckets whose lineage row exists; a crash between 1 and
     2 rewrites the bucket — overwrite makes the rewrite invisible.

Replaces the reference's "retry the HTTP request" failure model
(`/root/reference/src/controller/Ocr.ts:55-65`; TTL sweep
`script/cronjob_input.sh`) with deterministic batch resume.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ms_ocr_spark.extraction.pipeline import extract_documents

LINEAGE_COLS = [
    "job_id",
    "bucket",
    "n_docs",
    "n_spans",
    "n_media_missing",
    "wall_sec",
    "committed_at",
]


def _bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")


def _lineage_path(out_dir: str, job_id: str, bucket: int) -> str:
    return os.path.join(out_dir, "_lineage", f"{job_id}_bucket_{bucket:05d}.parquet")


def completed_buckets(out_dir: str, job_id: str, n_buckets: int) -> set[int]:
    return {
        b
        for b in range(n_buckets)
        if os.path.exists(_lineage_path(out_dir, job_id, b))
    }


def run_with_checkpoints(
    spark: SparkSession,
    docs: DataFrame,
    media: DataFrame,
    out_dir: str,
    job_id: str = "job",
    n_buckets: int = 16,
    max_buckets: int | None = None,
    **extract_kw,
) -> list[int]:
    """Process doc-id hash buckets one commit at a time; resumable.

    `max_buckets` bounds how many NEW buckets are processed this call
    (used by tests to simulate a crash mid-job).  Returns the buckets
    committed by this call.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    done = completed_buckets(out_dir, job_id, n_buckets)
    committed: list[int] = []
    for bucket in range(n_buckets):
        if bucket in done:
            continue
        if max_buckets is not None and len(committed) >= max_buckets:
            break
        t0 = time.time()
        subset = docs.filter(_bucket_col(n_buckets) == bucket)
        result = extract_documents(subset, media, **extract_kw).persist()
        data_path = os.path.join(out_dir, "data", f"bucket={bucket:05d}")
        result.write.mode("overwrite").parquet(data_path)
        stats = result.select(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum(F.size("spans")), F.lit(0)).alias("n_spans"),
            F.coalesce(
                F.sum(
                    F.size(
                        F.filter(
                            "spans",
                            lambda s: (s["kind"] == "media") & s["text"].isNull(),
                        )
                    )
                ),
                F.lit(0),
            ).alias("n_media_missing"),
        ).collect()[0]
        result.unpersist()
        # lineage marker LAST: its existence == the bucket is committed
        lp = _lineage_path(out_dir, job_id, bucket)
        os.makedirs(os.path.dirname(lp), exist_ok=True)
        row = {
            "job_id": job_id,
            "bucket": bucket,
            "n_docs": int(stats["n_docs"]),
            "n_spans": int(stats["n_spans"]),
            "n_media_missing": int(stats["n_media_missing"]),
            "wall_sec": float(time.time() - t0),
            "committed_at": float(time.time()),
        }
        pq.write_table(pa.Table.from_pylist([row]), lp + ".tmp")
        os.replace(lp + ".tmp", lp)  # atomic commit
        committed.append(bucket)
    return committed


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "data"))


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "_lineage"))


def extraction_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    """Aggregate job metrics from lineage (the metrics side table)."""
    lin = read_lineage(spark, out_dir)
    return lin.groupBy("job_id").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_spans").alias("n_spans"),
        F.sum("n_media_missing").alias("n_media_missing"),
        F.sum("wall_sec").alias("total_wall_sec"),
    )
