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


def trailing_ewma(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    value_col: str,
    window_rows: int = 8,
    alpha: float = 0.8,
    out_col: str = "ewma",
) -> DataFrame:
    """Trailing exponentially-weighted moving average over the last
    ``window_rows`` rows (current included) — the smoothing pass behind
    rate dashboards and anomaly baselines, in its finite-window form.

    The textbook recursive EMA is a sequential scan (hostile to both
    distribution and SQL replay); the finite-window form
    ``Σ α^age·v / Σ α^age`` over the trailing frame is an ordered
    window aggregate.  The α powers (and their prefix sums, for the
    ragged frames at each partition's head) are DRIVER-COMPUTED PLAN
    LITERALS, so both engines index the same doubles instead of
    re-deriving powers — and the fold over the collected frame runs in
    a fixed oldest→newest order, making every float addition
    order-pinned and engine-portable.

    NULL values never enter the frame (collect_list drops them — the
    one list-aggregate semantic Spark pins), so ages count NON-NULL
    observations: a gap does not stretch the decay.  An oracle must
    filter its list() the same way (DuckDB keeps NULLs by default).  A
    row whose own value is NULL still gets the EMA of its trailing
    frame.

    Scale shape: one shuffle on the partition key; the frame collect is
    bounded by ``window_rows`` (a literal), so per-row state is O(W)
    regardless of data volume.  Output: input columns + ``out_col``
    rounded to 6.
    """
    if window_rows <= 0:
        raise ValueError(f"trailing_ewma: window_rows > 0, got {window_rows}")
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"trailing_ewma: need 0 < alpha <= 1, got {alpha}")
    pows = [alpha ** a for a in range(window_rows)]
    prefix = []
    acc = 0.0
    for p in pows:
        acc += p
        prefix.append(acc)
    w_lit = F.array(*[F.lit(p) for p in pows])
    d_lit = F.array(*[F.lit(p) for p in prefix])
    w = (
        W.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(-(window_rows - 1), W.currentRow)
    )
    frame = F.collect_list(F.col(value_col).cast("double")).over(w)
    n = F.size(F.col("_fr"))
    # oldest→newest fold; age of element i (1-based) is n - i
    num = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0.0),
        lambda acc_, i: acc_
        + F.element_at(F.col("_fr"), i) * F.element_at(w_lit, n - i + 1),
    )
    # n = 0 (every frame row NULL) must short-circuit: sequence(1, 0)
    # DECREASES in Spark and element_at(_, 0) is an ANSI error
    ema = F.when(n > 0, F.round(num / F.element_at(d_lit, n), 6))
    return df.withColumn("_fr", frame).withColumn(out_col, ema).drop("_fr")
