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


# ---------------------------------------------------------------------------
# count-min sketch as a relational table (heavy-hitter / frequency scale path)
# ---------------------------------------------------------------------------

def _cms_buckets(item, depth: int, width: int):
    """depth (layer, bucket) probes for one item — xxhash64 seeded per

    layer by prepending the layer index, bucketed by pmod.  Plain column
    expressions: deterministic on any partitioning and engine session."""
    return [
        F.struct(
            F.lit(i).alias("layer"),
            F.pmod(F.xxhash64(F.lit(i), item), F.lit(width)).alias("bucket"),
        )
        for i in range(depth)
    ]


def cms_table(
    df: DataFrame,
    col: str,
    depth: int = 5,
    width: int = 8192,
    keys: list[str] | None = None,
) -> DataFrame:
    """Count-min sketch materialized as a TABLE of (layer, bucket, cnt) —

    no opaque binary, no UDF.  Each item increments one bucket per layer;
    the explode is absorbed by map-side combine, so the shuffle carries at
    most depth*width rows per group regardless of input size.  Mergeable
    across batches/groups by summing cnt over (layer, bucket) — the same
    no-rescan property as the HLL path above, for frequencies instead of
    distincts.  With ``keys`` one sketch per group.
    """
    ks = list(keys or [])
    item = F.col(col).cast("string")
    rows = df.select(*ks, F.explode(F.array(*_cms_buckets(item, depth, width))).alias("_lb"))
    return (
        rows.select(*ks, "_lb.layer", "_lb.bucket")
        .groupBy(*ks, "layer", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = 5,
    width: int = 8192,
    out: str = "est",
    keys: list[str] | None = None,
) -> DataFrame:
    """Probe the sketch table for candidate items: min over layers of the

    probed bucket counts (classic CMS point query; absent bucket = 0).
    The sketch side is at most depth*width rows — broadcast it; the probe
    is then a map-only broadcast join however many candidates there are.
    Guarantees est >= true count always; est <= true + eps*N with the
    usual CMS (eps = e/width) probabilistic bound.

    Probing a GROUPED sketch (``cms_table(..., keys=...)``) requires the
    same ``keys`` here — the items frame must carry them, and the join
    includes them.  Joining a grouped sketch on (layer, bucket) alone
    would take the min ACROSS groups and silently break the est >= true
    guarantee, so that mismatch raises.
    """
    ks = list(keys or [])
    for k in ks:
        if k not in cms.columns or k not in items.columns:
            raise ValueError(
                f"cms_estimate: group key '{k}' must be a column of both "
                "the sketch and the items frame"
            )
    extra = [c for c in cms.columns if c not in {"layer", "bucket", "cnt"}]
    if set(extra) != set(ks):
        raise ValueError(
            f"cms_estimate: sketch carries group keys {extra} but keys="
            f"{ks} was passed — the probe join must include every sketch "
            "key or the min mixes groups and underestimates"
        )
    item = F.col(col).cast("string")
    probes = items.select(
        "*", F.explode(F.array(*_cms_buckets(item, depth, width))).alias("_lb")
    ).select("*", "_lb.layer", "_lb.bucket").drop("_lb")
    joined = probes.join(
        F.broadcast(cms), [*ks, "layer", "bucket"], "left"
    ).withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
    others = [c for c in items.columns]
    return joined.groupBy(*others).agg(F.min("cnt").alias(out))
