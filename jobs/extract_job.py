#!/usr/bin/env python
"""spark-submit entrypoint for the extraction pipeline.

Cluster usage (north rule: packaged for --py-files, resumable):

    ./scripts/package.sh     # builds dist/ms_ocr_spark.zip
    spark-submit --py-files dist/ms_ocr_spark.zip jobs/extract_job.py \\
        --documents  s3a://bucket/warehouse/documents \\
        --media      s3a://bucket/warehouse/media_store \\
        --output     s3a://bucket/warehouse/extracted \\
        --job-id     extract-2026-08-16 \\
        --buckets    4096 --salt-partitions 8192

Re-running the same command after a failure resumes: committed buckets
(lineage markers, written through the output path's Hadoop FileSystem so
they work on object stores too) are skipped; partial buckets are
re-written by the dynamic partition overwrite.

Local smoke:

    python jobs/extract_job.py --documents .cache/bench_corpus_8000/documents.parquet \\
        --media .cache/bench_corpus_8000/media_store.parquet \\
        --output /tmp/extract_out --buckets 8
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--documents", required=True, help="documents table path")
    p.add_argument("--media", required=True, help="media_store table path")
    p.add_argument("--output", required=True, help="output root (data/ + _lineage/)")
    p.add_argument("--job-id", default="extract")
    p.add_argument("--buckets", type=int, default=64, help="checkpoint commit ranges")
    p.add_argument("--salt-partitions", type=int, default=None)
    p.add_argument("--no-broadcast-media", action="store_true")
    p.add_argument("--two-level-regroup", action="store_true")
    p.add_argument("--no-validate-payloads", action="store_true",
                   help="skip the magic-byte/size admission control (on by default; invalid media -> null text + quarantine sink + lineage n_media_missing)")
    args = p.parse_args(argv)
    args.validate_payloads = not args.no_validate_payloads

    from ms_ocr_spark.plans.checkpoint import extraction_metrics, run_with_checkpoints
    from ms_ocr_spark.session import get_spark

    spark = get_spark(app=f"extract:{args.job_id}")
    docs = spark.read.parquet(args.documents)
    media = spark.read.parquet(args.media)
    committed = run_with_checkpoints(
        spark,
        docs,
        media,
        args.output,
        job_id=args.job_id,
        n_buckets=args.buckets,
        broadcast_media=not args.no_broadcast_media,
        salt_partitions=args.salt_partitions,
        two_level_regroup=args.two_level_regroup,
        validate_payloads=args.validate_payloads,
    )
    if args.validate_payloads:
        from ms_ocr_spark.extraction.pipeline import quarantine_invalid_media

        quarantine_invalid_media(docs, media).write.mode("overwrite").parquet(
            f"{args.output.rstrip('/')}/_quarantine"
        )
    metrics = extraction_metrics(spark, args.output).collect()
    print(
        json.dumps(
            {
                "job_id": args.job_id,
                "buckets_committed_this_run": committed,
                "metrics": [row.asDict() for row in metrics],
            },
            default=str,
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
