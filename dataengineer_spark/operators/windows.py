"""Window functions (E6) — engine extension on stock Spark.

One shuffle on the partition keys; frames evaluate inside the sorted
partition. Per-group top-k composes row_number over a descending order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def ranked(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    rank_col: str = "rn",
    method: str = "row_number",
) -> DataFrame:
    """Attach row_number/rank/dense_rank within each partition."""
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[method]
    w = W.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, fn().over(w))


def top_k_per_group(
    df: DataFrame, partition_by: list[str], order_by: list[Column], k: int
) -> DataFrame:
    """E7 per-group top-k: row_number ≤ k. AQE handles skewed groups; the

    sort is per-partition, never global."""
    return (
        ranked(df, partition_by, order_by, "_rn")
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def lag_lead(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    col: str,
    offsets: tuple[int, int] = (1, 1),
) -> DataFrame:
    """Previous/next value columns (``{col}_lag``, ``{col}_lead``)."""
    w = W.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(f"{col}_lag", F.lag(col, offsets[0]).over(w)).withColumn(
        f"{col}_lead", F.lead(col, offsets[1]).over(w)
    )


def running_agg(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    agg: Column,
    out_col: str,
    frame: tuple[int, int] = (W.unboundedPreceding, W.currentRow),
) -> DataFrame:
    """Running/windowed aggregate over a row frame (cumulative by default)."""
    w = W.partitionBy(*partition_by).orderBy(*order_by).rowsBetween(*frame)
    return df.withColumn(out_col, agg.over(w))
