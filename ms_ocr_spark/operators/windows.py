"""Window-based operators: gap sessionization, interval merge, top-k.

Spark-native re-expressions of the reference's order-dependent scan
operators (SURVEY.md §2.4 A2, §2.5 W1/W2/W4/W5):

  * gap_cluster      ~ `_clusterPosition` (`/root/reference/src/library/
                       data_to_table/main.py:256-272`) — new cluster when
                       the sorted-position gap exceeds a tolerance
  * merge_intervals  ~ in-row box merge (`/root/reference/src/library/
                       detection_craft/main.py:131-166`)
  * top_k_per_group  ~ argmax/limit patterns (`engine_paddle/main.py:
                       173-175`, maxCandidates caps)

All are pure DataFrame/Window transforms — whole-stage-codegen'd, one
shuffle on the partition keys, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def gap_cluster(
    df: DataFrame,
    partition_cols: list[str],
    pos_col: str,
    tolerance: float,
    out_col: str = "cluster_id",
) -> DataFrame:
    """Assign 0-based cluster ids: new cluster when gap > tolerance.

    Classic sessionization: lag -> gap flag -> running sum.  One shuffle on
    partition_cols; at 100 TB the partition key (e.g. doc_id/user_id) keeps
    state bounded per key, never global.
    """
    w = Window.partitionBy(*partition_cols).orderBy(pos_col)
    gap = F.col(pos_col) - F.lag(pos_col).over(w)
    is_new = F.when(gap.isNull() | (gap <= tolerance), F.lit(0)).otherwise(F.lit(1))
    return df.withColumn(
        out_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )


def merge_intervals(
    df: DataFrame,
    partition_cols: list[str],
    start_col: str,
    end_col: str,
    gap: float = 0,
) -> DataFrame:
    """Merge overlapping/adjacent intervals per partition key.

    new-group flag = start > running max(end of predecessors) + gap; the
    running max handles intervals nested inside earlier, longer ones.
    Output: one row per merged interval with `{start,end}_col` bounds and
    `n_merged`.
    """
    w = Window.partitionBy(*partition_cols).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end + gap), F.lit(1)
    ).otherwise(F.lit(0))
    grouped = df.withColumn(
        "_grp", F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        grouped.groupBy(*partition_cols, "_grp")
        .agg(
            F.min(start_col).alias(start_col),
            F.max(end_col).alias(end_col),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("_grp")
    )


def top_k_per_group(
    df: DataFrame,
    partition_cols: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """row_number-based deterministic top-k (callers must make order_by a
    total order — include a unique tiebreak column)."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def sequence_number(
    df: DataFrame, partition_cols: list[str], order_cols: list[str], out_col: str = "seq_id"
) -> DataFrame:
    """1-based detection-order numbering (reference `enumerate(dataList, 1)`,
    `/root/reference/src/library/engine_realtime/main.py:94`)."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.withColumn(out_col, F.row_number().over(w))
