"""Composite analytical queries (TPC-H-shaped) over the star schema.

These exercise the join-planning surface end-to-end: broadcast for
dimension sides, shuffle hash/sort-merge for fact-fact, partial aggregation
before the shuffle. Column set adapted to the driver testdata (FIXTURES.md
§A — e.g. no o_shippriority/l_commitdate in the synthetic schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def revenue() -> F.Column:
    return F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))


def q3_shipping_priority(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
    segment: str = "BUILDING", cutoff: str = "1997-03-15", k: int = 10,
) -> DataFrame:
    """Q3-style: revenue of undelivered orders for one market segment.

    customer is dimension-sized → broadcast; orders⋈lineitem shuffles on
    the order key; aggregation is partial before the final shuffle.
    """
    c = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    o = orders.where(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    l = lineitem.where(F.col("l_shipdate") > cutoff).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(revenue(), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(k)
    )


def q5_local_supplier_volume(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
    supplier: DataFrame, nation: DataFrame, region: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01", date_to: str = "1997-01-01",
) -> DataFrame:
    """Q5-style: revenue by nation where supplier and customer share the

    nation. The nation/region/supplier/customer sides are all broadcast;
    only orders⋈lineitem shuffles."""
    r = region.where(F.col("r_name") == region_name)
    n = nation.join(F.broadcast(r), nation.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    o = orders.where(
        (F.col("o_orderdate") >= date_from) & (F.col("o_orderdate") < date_to)
    ).select("o_orderkey", "o_custkey")
    return (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.round(revenue(), 2).alias("revenue"))
    )


def q6_forecast_revenue(
    lineitem: DataFrame,
    date_from: str = "1996-01-01", date_to: str = "1997-01-01",
    disc_lo: float = 0.05, disc_hi: float = 0.07, max_qty: int = 24,
) -> DataFrame:
    """Q6-style: single filtered scalar aggregate — the pure scan-pushdown

    showcase (all four predicates reach the parquet row-group filter; no
    shuffle at all, partial sums merge at the driver)."""
    return (
        lineitem.where(
            (F.col("l_shipdate") >= date_from)
            & (F.col("l_shipdate") < date_to)
            & F.col("l_discount").between(disc_lo, disc_hi)
            & (F.col("l_quantity") < max_qty)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


def q18_large_orders(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
    min_qty: float = 300.0,
) -> DataFrame:
    """Q18-style: orders whose total quantity exceeds a threshold, enriched

    with customer identity. The HAVING filter runs on the aggregated (small)
    side before both joins, so the fact table shuffles once on its group
    key and the survivors broadcast."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > min_qty)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(customer.select("c_custkey", "c_name")),
              orders.o_custkey == F.col("c_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            F.round("total_qty", 2).alias("total_qty"),
        )
    )


def q12_priority_shipping(
    orders: DataFrame, lineitem: DataFrame,
    date_from: str = "1996-01-01", date_to: str = "1997-01-01",
) -> DataFrame:
    """Q12-style (adapted to the synthetic schema: l_shipmode doesn't

    exist, so lines group by return flag): count critical- vs normal-
    priority orders per flag — CASE-sum conditional aggregation over the
    fact join, one shuffle for the join + partial aggregation."""
    l = lineitem.where(
        (F.col("l_shipdate") >= date_from) & (F.col("l_shipdate") < date_to)
    ).select("l_orderkey", "l_returnflag")
    o = orders.select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("bigint")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(1 - high).alias("low_line_count"),
        )
    )


def q14_promo_revenue(
    lineitem: DataFrame, part: DataFrame,
    date_from: str = "1996-01-01", date_to: str = "1996-02-01",
) -> DataFrame:
    """Q14-style: promo revenue share of a month — two conditional sums in

    one pass over the filtered fact join; part side broadcast."""
    l = lineitem.where(
        (F.col("l_shipdate") >= date_from) & (F.col("l_shipdate") < date_to)
    ).select("l_partkey", "l_extendedprice", "l_discount")
    p = part.select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(F.lit(100.0) * F.sum(promo) / F.sum(rev), 6).alias("promo_pct")
        )
    )


def q17_small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#1"
) -> DataFrame:
    """Q17-style: revenue of below-average-quantity orders for one brand —

    the correlated-scalar-subquery shape, decorrelated by hand into a
    per-part aggregate joined back. The brand's part list and its per-part
    limits are both dimension-sized → broadcast; lineitem scans twice
    (limit build + probe), which at scale beats materializing the fact
    table."""
    p = part.where(F.col("p_brand") == brand).select("p_partkey")
    li = (
        lineitem.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .drop("p_partkey")
    )
    limits = li.groupBy("l_partkey").agg((F.avg("l_quantity") * 0.2).alias("lim"))
    return (
        li.join(F.broadcast(limits), "l_partkey")
        .where(F.col("l_quantity") < F.col("lim"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


def q10_returned_items(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
    nation: DataFrame, date_from: str = "1996-01-01", date_to: str = "1996-07-01",
    k: int = 20,
) -> DataFrame:
    """Q10-style: customers who returned the most revenue in a quarter."""
    o = orders.where(
        (F.col("o_orderdate") >= date_from) & (F.col("o_orderdate") < date_to)
    ).select("o_orderkey", "o_custkey")
    l = lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(customer.select("c_custkey", "c_name", "c_nationkey")),
              o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(revenue(), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(k)
    )
