"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship interleaved-extraction query on sf0.001
queries()     -> named operator queries (SURVEY.md §2 + training-data suite)
oracle_sql()  -> DuckDB twins for every SQL-expressible query
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ms_ocr_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: wrap sf0.001 documents into interleaved text+media spans,
    run the full extraction pipeline (Arc90 strip + OCR kernel + offset
    re-stitch), return the flattened span rows."""
    return _q.extract_spans(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
