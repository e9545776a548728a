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


def top_k_per_group_salted(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int,
    salt_on: list[str],
    buckets: int = 16,
) -> DataFrame:
    """Exact per-group top-k for SKEWED groups, in two phases.

    A window over a hot key sorts that key's entire partition on one task
    (the one skew shape AQE does not split). Phase 1 spreads each group
    over ``buckets`` salted sub-partitions (salt = hash of ``salt_on``
    row content) and keeps top-k per sub-partition; phase 2 runs the
    plain window over the pruned set — at most ``buckets·k`` rows per
    group, regardless of how hot the key is. Result is exactly
    ``top_k_per_group`` (global top-k is a subset of the union of
    per-salt top-k); ``order_by`` should be a total order for
    deterministic output.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_on]), F.lit(buckets))
    salted = df.withColumn("_salt", salt)
    w1 = W.partitionBy(*partition_by, "_salt").orderBy(*order_by)
    pruned = (
        salted.withColumn("_prn", F.row_number().over(w1))
        .where(F.col("_prn") <= k)
        .drop("_prn", "_salt")
    )
    return top_k_per_group(pruned, partition_by, order_by, k)


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


def distribution_ranks(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    n_tiles: int = 4,
) -> DataFrame:
    """Distribution window functions in one pass over one sorted
    partition: ntile bucket, percent_rank, and cume_dist — all share a
    single window spec, so Catalyst plans ONE Window operator (one
    shuffle + one sort)."""
    w = W.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn("tile", F.ntile(n_tiles).over(w))
        .withColumn("pct_rank", F.percent_rank().over(w))
        .withColumn("cume", F.cume_dist().over(w))
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


def trailing_range_agg(
    df: DataFrame,
    part_col: str,
    ts_col: str,
    trailing_seconds: int,
    value_col: str,
) -> DataFrame:
    """Event-TIME trailing window (RANGE frame, E6): per partition key,

    aggregates over every row whose timestamp falls in the trailing
    ``trailing_seconds``-second interval — the 7-day-rolling-activity
    shape. ROWS frames count physical rows and silently change meaning
    under irregular sampling; the RANGE frame here is anchored to epoch
    seconds, so gaps and bursts are handled correctly, and timestamp
    PEERS (equal seconds) all see the same frame on every engine. Order-
    independent aggregates only (count / min / max) — a rolling SUM of
    doubles would be fold-order-dependent and engine-divergent.

    One window shuffle on the partition key; frame evaluation is a
    per-task sliding cursor, never a per-row rescan.
    """
    ets = F.col(ts_col).cast("long")
    w = (
        W.partitionBy(part_col)
        .orderBy(ets)
        .rangeBetween(-int(trailing_seconds), 0)
    )
    return df.select(
        "*",
        F.count("*").over(w).alias("trailing_n"),
        F.min(value_col).over(w).alias("trailing_min"),
        F.max(value_col).over(w).alias("trailing_max"),
    )
