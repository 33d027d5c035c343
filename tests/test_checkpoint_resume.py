"""Resume test (SURVEY.md §5 item 5): crash after k buckets, resume,
byte-identical output, no duplicate commits."""

from __future__ import annotations

from pyspark.sql import functions as F

from ms_ocr_spark.plans import checkpoint as cp


def test_checkpoint_resume_exactly_once(spark, corpus_dir, tmp_path):
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    media = spark.read.parquet(f"{corpus_dir}/media_store.parquet")
    golden = spark.read.parquet(f"{corpus_dir}/golden_spans.parquet")
    out = str(tmp_path / "out")

    # "crash" after 3 of 8 buckets
    first = cp.run_with_checkpoints(
        spark, docs, media, out, job_id="j1", n_buckets=8, max_buckets=3
    )
    assert len(first) == 3
    assert cp.completed_buckets(spark, out, "j1", 8) == set(first)

    # resume: only the remaining buckets are processed
    second = cp.run_with_checkpoints(spark, docs, media, out, job_id="j1", n_buckets=8)
    assert sorted(first + second) == list(range(8))
    assert set(first).isdisjoint(second)

    # a third call is a no-op (no duplicate commits)
    assert cp.run_with_checkpoints(spark, docs, media, out, job_id="j1", n_buckets=8) == []

    # full output equals golden, no duplicates
    result = cp.read_output(spark, out)
    assert result.count() == golden.count()
    assert result.select("doc_id").distinct().count() == golden.count()
    r = result.select("doc_id", F.to_json("spans").alias("js"))
    g = golden.select("doc_id", F.to_json("spans").alias("js"))
    assert g.join(r, ["doc_id", "js"]).count() == golden.count()

    # lineage + metrics side tables
    lin = cp.read_lineage(spark, out)
    assert lin.count() == 8
    met = cp.extraction_metrics(spark, out).collect()[0]
    assert met["n_docs"] == golden.count()
    assert met["n_spans"] == golden.select(F.sum(F.size("spans"))).collect()[0][0]
    assert met["n_media_missing"] == 0


def test_checkpoint_single_input_scan(spark, corpus_dir):
    """The pending-bucket extraction must read the documents table ONCE —
    a per-bucket loop would rescan 100 TB once per bucket."""
    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    media = spark.read.parquet(f"{corpus_dir}/media_store.parquet")
    plan = (
        cp.pending_extraction(docs, media, list(range(8)), 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("documents.parquet") == 1, "documents scanned more than once"


def test_streaming_incremental(spark, corpus_dir, tmp_path):
    from ms_ocr_spark.streaming.incremental import stream_extract

    media = spark.read.parquet(f"{corpus_dir}/media_store.parquet")
    golden = spark.read.parquet(f"{corpus_dir}/golden_spans.parquet")
    out = str(tmp_path / "stream_out")
    # the file stream source requires a DIRECTORY of files
    docs_dir = tmp_path / "docs_in"
    docs_dir.mkdir()
    (docs_dir / "part-0.parquet").symlink_to(f"{corpus_dir}/documents.parquet")
    q = stream_extract(
        spark,
        str(docs_dir),
        media,
        out,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)
    result = spark.read.parquet(out + "/epoch=*")
    assert result.count() == golden.count()
    r = result.select("doc_id", F.to_json("spans").alias("js"))
    g = golden.select("doc_id", F.to_json("spans").alias("js"))
    assert g.join(r, ["doc_id", "js"]).count() == golden.count()


def test_extract_job_cli(spark, corpus_dir, tmp_path):
    """spark-submit entrypoint smoke: run via main(), resume is a no-op."""
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    try:
        import extract_job
    finally:
        sys.path.pop(0)
    out = str(tmp_path / "cli_out")
    args = [
        "--documents", f"{corpus_dir}/documents.parquet",
        "--media", f"{corpus_dir}/media_store.parquet",
        "--output", out, "--buckets", "4", "--job-id", "t",
    ]
    assert extract_job.main(args) == 0
    golden = spark.read.parquet(f"{corpus_dir}/golden_spans.parquet")
    from ms_ocr_spark.plans.checkpoint import read_output

    assert read_output(spark, out).count() == golden.count()
    assert extract_job.main(args) == 0  # resume: no duplicates
    assert read_output(spark, out).count() == golden.count()


def test_streaming_second_epoch_exactly_once(spark, corpus_dir, tmp_path):
    """New files landing later are extracted exactly once: re-running the
    stream with the same checkpoint skips epoch-1 files and emits only the
    new docs; the union has no duplicates."""
    from ms_ocr_spark.sources.datagen import write_corpus
    from ms_ocr_spark.streaming.incremental import stream_extract

    # corpus generation is deterministic per doc INDEX, so a 70-doc corpus
    # at the same seed is a strict superset of the shared 60-doc fixture:
    # docs 60..69 are a brand-new second batch with consistent media refs
    import duckdb

    big = write_corpus(str(tmp_path / "c70"), n_docs=70, seed=42)
    media = spark.read.parquet(big["media_store"])
    batch2 = str(tmp_path / "batch2.parquet")
    duckdb.sql(
        f"COPY (SELECT * FROM read_parquet('{big['documents']}') "
        "WHERE doc_id >= 'doc-00000060') TO '" + batch2 + "' (FORMAT PARQUET)"
    )
    docs_dir = tmp_path / "docs_in"
    docs_dir.mkdir()
    (docs_dir / "batch1.parquet").symlink_to(f"{corpus_dir}/documents.parquet")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    q = stream_extract(spark, str(docs_dir), media, out, ckpt)
    q.awaitTermination(300)
    n1 = spark.read.parquet(out + "/epoch=*").count()

    (docs_dir / "batch2.parquet").symlink_to(batch2)
    q2 = stream_extract(spark, str(docs_dir), media, out, ckpt)
    q2.awaitTermination(300)
    result = spark.read.parquet(out + "/epoch=*")
    assert result.count() == n1 + 10
    assert result.select("doc_id").distinct().count() == result.count()


def test_expire_old_sweeps_stale_buckets(spark, corpus_dir, tmp_path):
    """S13 retention sweep on the plain-filesystem layout: entries older
    than the cutoff are deleted (data partitions + lineage markers),
    newer ones survive."""
    import datetime

    from ms_ocr_spark.sources.catalog import expire_old

    docs = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    media = spark.read.parquet(f"{corpus_dir}/media_store.parquet")
    out = str(tmp_path / "ttl_out")
    cp.run_with_checkpoints(spark, docs, media, out, job_id="t", n_buckets=4)
    assert cp.read_output(spark, out).count() > 0

    past = (
        datetime.datetime.now(datetime.timezone.utc) - datetime.timedelta(hours=1)
    ).strftime("%Y-%m-%dT%H:%M:%S")
    assert expire_old(spark, out, past) == []  # nothing older than 1h ago

    future = (
        datetime.datetime.now(datetime.timezone.utc) + datetime.timedelta(hours=1)
    ).strftime("%Y-%m-%dT%H:%M:%S")
    deleted = expire_old(spark, out, future)  # everything predates +1h
    assert len(deleted) == 8  # 4 bucket dirs + 4 lineage markers
    assert cp.completed_buckets(spark, out, "t", 4) == set()


def test_stream_dedup_first_seen_across_restarts(spark, tmp_path):
    """applyInPandasWithState first-seen dedup: within a batch the min id
    wins; a duplicate arriving in a LATER drain (fresh query, same
    checkpoint -> persisted GroupState) is suppressed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ms_ocr_spark.streaming.stateful import stream_dedup_first_seen

    docs_dir = tmp_path / "sd_in"
    docs_dir.mkdir()
    out = str(tmp_path / "sd_out")
    ckpt = str(tmp_path / "sd_ckpt")
    schema = pa.schema([("doc_id", pa.string()), ("text", pa.string())])

    def drain(rows, fname):
        pq.write_table(
            pa.Table.from_pylist(rows, schema=schema), str(docs_dir / fname)
        )
        stream = (
            spark.readStream.schema("doc_id string, text string")
            .parquet(str(docs_dir))
        )
        q = (
            stream_dedup_first_seen(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    drain(
        [
            {"doc_id": "d2", "text": "alpha"},
            {"doc_id": "d1", "text": "alpha"},  # same content, smaller id
            {"doc_id": "d3", "text": "beta"},
        ],
        "b1.parquet",
    )
    got1 = {(r["doc_id"], r["text"]) for r in spark.read.parquet(out).collect()}
    assert got1 == {("d1", "alpha"), ("d3", "beta")}

    drain(
        [
            {"doc_id": "d4", "text": "alpha"},  # dup across restarts
            {"doc_id": "d5", "text": "gamma"},  # genuinely new
        ],
        "b2.parquet",
    )
    got2 = {(r["doc_id"], r["text"]) for r in spark.read.parquet(out).collect()}
    assert got2 == {("d1", "alpha"), ("d3", "beta"), ("d5", "gamma")}


def test_stream_windowed_counts_drop_late_events(spark, tmp_path):
    """Watermarked tumbling windows: a second drain whose event is older
    than (max seen ts - watermark) is dropped; finalized windows emit
    exactly once (append mode)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ms_ocr_spark.streaming.stateful import stream_windowed_event_counts

    ev_dir = tmp_path / "ev_in"
    ev_dir.mkdir()
    out = str(tmp_path / "ev_out")
    ckpt = str(tmp_path / "ev_ckpt")
    schema = pa.schema([("ts", pa.timestamp("us")), ("user", pa.string())])

    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)

    def drain(rows, fname):
        pq.write_table(
            pa.Table.from_pylist(rows, schema=schema), str(ev_dir / fname)
        )
        stream = spark.readStream.schema("ts timestamp, user string").parquet(
            str(ev_dir)
        )
        q = (
            stream_windowed_event_counts(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # batch 1: two events in [12:00,12:05), one at 13:00 (advances the
    # watermark to 12:50 and finalizes the noon window)
    drain(
        [
            {"ts": base, "user": "a"},
            {"ts": base + dt.timedelta(minutes=2), "user": "b"},
            {"ts": base + dt.timedelta(hours=1), "user": "c"},
        ],
        "e1.parquet",
    )
    rows1 = {
        (str(r["win_start"]), r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    assert ("2024-01-01 12:00:00", 2) in rows1
    # batch 2: a LATE event for the finalized noon window -> dropped (no
    # duplicate/updated emission for that window)
    drain([{"ts": base + dt.timedelta(minutes=1), "user": "late"}], "e2.parquet")
    rows2 = [
        r["n_events"]
        for r in spark.read.parquet(out).collect()
        if str(r["win_start"]) == "2024-01-01 12:00:00"
    ]
    assert rows2 == [2]


def test_checkpoint_job_routes_language_column(spark, tmp_path):
    """The checkpointed job path (run_with_checkpoints -> pending_extraction
    -> extract_documents) must carry the doc-level language column through
    bucketing — routed ja_vert squares only decode via that column."""
    from ms_ocr_spark.plans.checkpoint import run_with_checkpoints
    from ms_ocr_spark.sources.datagen import write_corpus

    paths = write_corpus(str(tmp_path / "rj"), n_docs=20, seed=29, routed_pct=0.6)
    docs = spark.read.parquet(paths["documents"])
    media = spark.read.parquet(paths["media_store"])
    golden = spark.read.parquet(paths["golden_spans"])
    out = str(tmp_path / "rj_out")
    committed = run_with_checkpoints(
        spark, docs, media, out, job_id="rj", n_buckets=4
    )
    assert len(committed) == 4
    result = spark.read.parquet(out + "/data")
    r = result.select("doc_id", F.to_json("spans").alias("js"))
    g = golden.select("doc_id", F.to_json("spans").alias("js"))
    assert g.join(r, ["doc_id", "js"]).count() == golden.count()


def test_checkpoint_resume_composed_round4_tiers(spark, tmp_path):
    """Crash-and-resume over a corpus composing EVERY round-4 tier
    (katakana routing, RGB, JPEG, TIFF variants, progressive + garbage
    payloads): resume is exactly-once, output matches golden (quarantined
    media -> null text), and lineage counts the quarantined media."""
    from ms_ocr_spark.sources.datagen import write_corpus

    paths = write_corpus(
        str(tmp_path / "r4"),
        n_docs=24,
        seed=31,
        routed_pct=0.3,
        rgb_pct=0.2,
        jpeg_pct=0.2,
        tiff_pct=0.2,
        prog_jpeg_pct=0.1,
        truncated_jpeg_pct=0.1,
        invalid_pct=0.1,
    )
    docs = spark.read.parquet(paths["documents"])
    media = spark.read.parquet(paths["media_store"])
    golden = spark.read.parquet(paths["golden_spans"])
    out = str(tmp_path / "r4_out")

    first = cp.run_with_checkpoints(
        spark, docs, media, out, job_id="r4", n_buckets=6, max_buckets=2
    )
    assert len(first) == 2
    second = cp.run_with_checkpoints(spark, docs, media, out, job_id="r4", n_buckets=6)
    assert sorted(first + second) == list(range(6))

    result = cp.read_output(spark, out)
    r = result.select("doc_id", F.to_json("spans").alias("js"))
    g = golden.select("doc_id", F.to_json("spans").alias("js"))
    assert g.join(r, ["doc_id", "js"]).count() == golden.count()

    n_quarantined = golden.select(
        F.sum(
            F.size(
                F.filter(
                    "spans", lambda s: (s["kind"] == "media") & s["text"].isNull()
                )
            )
        )
    ).collect()[0][0]
    assert n_quarantined > 0, "composed corpus should contain quarantined media"
    met = cp.extraction_metrics(spark, out).collect()[0]
    assert met["n_media_missing"] == n_quarantined
