"""Mergeable sketches (E5 scale path) — Apache DataSketches via Spark 4.

The incremental-distinct pattern for the batch-audited lake: compute one
fixed-size HLL sketch per (group, batch) partition as data lands, then
answer "distinct over any batch range" by UNIONING sketches — no rescan of
history, no expand shuffle. Sketches are opaque ``binary`` columns, safe
to store alongside the audit table. Estimates are deterministic for a
given input and lgK.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_sketch(df: DataFrame, keys: list[str], col: str, lgk: int = 12) -> DataFrame:
    """One HLL sketch per group over ``col`` (binary column ``sketch``)."""
    return df.groupBy(*keys).agg(F.hll_sketch_agg(col, F.lit(lgk)).alias("sketch"))


def hll_merge(
    df: DataFrame, keys: list[str], sketch_col: str = "sketch", out: str = "n_distinct"
) -> DataFrame:
    """Union per-partition sketches up to ``keys`` and estimate distincts.

    This is the rollup step: sketches computed per (keys…, batch_id) merge
    to per-keys totals without touching raw data.
    """
    return df.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias(out)
    )
