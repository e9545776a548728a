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


def q1_pricing_summary(lineitem: DataFrame, cutoff: str = "2000-12-01") -> DataFrame:
    """Q1-style pricing summary: the canonical wide-aggregate scan.

    One pass, no join; partial aggregation map-side collapses ~600k rows
    to 6 groups before the (tiny) shuffle. At 100 TB this is scan-bound:
    only the 7 referenced columns are read, and the shipdate predicate
    prunes row groups."""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.where(F.col("l_shipdate") <= cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q4_order_priority(
    orders: DataFrame, lineitem: DataFrame,
    date_from: str = "1996-01-01", date_to: str = "1996-07-01",
) -> DataFrame:
    """Q4-style order-priority check, adapted: EXISTS(line with returnflag
    'R') stands in for the commitdate<receiptdate test (synthetic schema
    has no commit/receipt dates). Left-semi join — the probe side never
    widens, and dedup of the EXISTS side happens inside the semi join."""
    o = orders.where(
        (F.col("o_orderdate") >= date_from) & (F.col("o_orderdate") < date_to)
    ).select("o_orderkey", "o_orderpriority")
    returned = lineitem.where(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q7_nation_volume(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
    supplier: DataFrame, nation: DataFrame,
    nation_a: str = "NATION_1", nation_b: str = "NATION_2",
    date_from: str = "1996-01-01", date_to: str = "1998-01-01",
) -> DataFrame:
    """Q7-style bilateral trade volume: revenue shipped between two nations
    by (supplier nation, customer nation, year). Both nation filters reach
    the broadcast dim sides before the fact join; the disjunctive pair
    condition applies after both enrichments in one filter."""
    n = nation.where(F.col("n_name").isin(nation_a, nation_b)).select(
        "n_nationkey", "n_name"
    )
    s = (
        supplier.select("s_suppkey", "s_nationkey")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        customer.select("c_custkey", "c_nationkey")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    l = lineitem.where(
        (F.col("l_shipdate") >= date_from) & (F.col("l_shipdate") < date_to)
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    return (
        l.join(orders.select("o_orderkey", "o_custkey"),
               l.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .where(
            ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
        )
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(F.round(revenue(), 2).alias("volume"))
    )


def q8_market_share(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
    supplier: DataFrame, nation: DataFrame, region: DataFrame, part: DataFrame,
    region_name: str = "ASIA", target_nation: str = "NATION_2",
    part_type: str = "ECONOMY",
    date_from: str = "1996-01-01", date_to: str = "1998-01-01",
) -> DataFrame:
    """Q8-style market share: fraction of one region's revenue for a part
    type that was supplied by one nation, per order year. The share is a
    conditional-sum / sum over the fully-joined fact — one aggregate pass,
    every dimension broadcast."""
    r = region.where(F.col("r_name") == region_name)
    cust_nations = nation.join(
        F.broadcast(r), nation.n_regionkey == r.r_regionkey
    ).select("n_nationkey")
    p = part.where(F.col("p_type") == part_type).select("p_partkey")
    supp = (
        supplier.select("s_suppkey", "s_nationkey")
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    o = orders.where(
        (F.col("o_orderdate") >= date_from) & (F.col("o_orderdate") < date_to)
    ).select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year"))
    c = customer.select("c_custkey", "c_nationkey").join(
        F.broadcast(cust_nations), F.col("c_nationkey") == F.col("n_nationkey"), "left_semi"
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("supp_nation") == target_nation, rev).otherwise(F.lit(0.0))
    return (
        lineitem.select("l_orderkey", "l_partkey", "l_suppkey",
                        "l_extendedprice", "l_discount")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey, "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("o_year")
        .agg(F.round(F.sum(target) / F.sum(rev), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


def q9_product_profit(
    lineitem: DataFrame, orders: DataFrame, part: DataFrame,
    supplier: DataFrame, nation: DataFrame,
    name_token: str = "widget", cost_factor: float = 0.08,
) -> DataFrame:
    """Q9-style product-type profit, adapted: there is no partsupp table,
    so unit cost is modeled as cost_factor * p_retailprice. Profit by
    (supplier nation, order year) for parts whose name contains a token.
    The p_name LIKE filter prunes the broadcast part side before the fact
    join — the classic push-the-selective-dim-filter-first shape."""
    p = part.where(F.col("p_name").contains(name_token)).select(
        "p_partkey", "p_retailprice"
    )
    supp = (
        supplier.select("s_suppkey", "s_nationkey")
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    # accumulate in decimal: the double sum's association order straddles the
    # 2-dp rounding boundary between engines on this aggregate
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(cost_factor) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    return (
        lineitem.select("l_orderkey", "l_partkey", "l_suppkey",
                        "l_quantity", "l_extendedprice", "l_discount")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(orders.select("o_orderkey", F.year("o_orderdate").alias("o_year")),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum(amount).cast("double"), 2).alias("sum_profit"))
    )


def q13_customer_distribution(
    customer: DataFrame, orders: DataFrame,
    exclude_priority: str = "5-LOW",
) -> DataFrame:
    """Q13-style customer order-count distribution: left outer join so
    zero-order customers survive, two-level aggregation (per-customer
    count, then histogram of counts). The second groupBy is tiny; the
    first shuffles on c_custkey — at scale, the left join and first
    aggregate share the same hash partitioning so AQE fuses them."""
    o = orders.where(F.col("o_orderpriority") != exclude_priority).select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        customer.select("c_custkey")
        .join(o, customer.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q15_top_supplier(
    lineitem: DataFrame, supplier: DataFrame,
    date_from: str = "1996-01-01", date_to: str = "1996-04-01",
) -> DataFrame:
    """Q15-style top supplier: per-supplier revenue for a quarter, keep
    the max-revenue supplier(s). The revenue relation is aggregated once
    and reused for the scalar max via a broadcast self-join — no window
    over the whole relation, no second scan of lineitem."""
    rev = (
        lineitem.where(
            (F.col("l_shipdate") >= date_from) & (F.col("l_shipdate") < date_to)
        )
        .groupBy("l_suppkey")
        .agg(F.round(revenue(), 2).alias("total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(top), rev.total_revenue == F.col("mx"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q16_supplier_part_count(
    lineitem: DataFrame, part: DataFrame,
    exclude_brand: str = "Brand#1", sizes: tuple = (1, 7, 13, 19, 25, 31, 37, 43),
) -> DataFrame:
    """Q16-style supplier count per part attribute, adapted: supplier-part
    relationships come from lineitem (no partsupp table). countDistinct
    over the joined fact; the part-side filters (brand exclusion + size
    whitelist) prune the broadcast dim before the join."""
    p = part.where(
        (F.col("p_brand") != exclude_brand) & F.col("p_size").isin(*sizes)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


def q19_disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Q19-style disjunctive predicate join: three OR'd (brand, size,
    quantity) branches evaluated as one filter over a single broadcast
    join — Catalyst extracts the common p_partkey equi-condition so this
    stays a hash join, not a cartesian."""
    p = part.select("p_partkey", "p_brand", "p_size")
    branch1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    branch2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    )
    branch3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .where(branch1 | branch2 | branch3)
        .agg(F.round(revenue(), 2).alias("revenue"))
    )


def q22_dormant_customers(
    customer: DataFrame, orders: DataFrame,
    nation_keys: tuple = (0, 1, 2, 3, 4, 5, 6),
    recent_from: str = "2000-01-01",
) -> DataFrame:
    """Q22-style dormant high-balance customers, adapted: nation keys
    stand in for phone country codes, and "no orders" (every synthetic
    customer has some) becomes "no orders since recent_from". Scalar
    subquery average → broadcast one-row frame; anti join against the
    filtered orders projection."""
    base = customer.where(F.col("c_nationkey").isin(*nation_keys)).select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = base.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = orders.where(F.col("o_orderdate") >= recent_from).select("o_custkey")
    return (
        base.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, base.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


def q2_min_cost_supplier(
    lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
    nation: DataFrame, region: DataFrame,
    region_name: str = "EUROPE", size: int = 19, p_type: str = "LARGE",
    k: int = 100,
) -> DataFrame:
    """Q2-style min-cost supplier per part, adapted: no partsupp table, so
    the (part, supplier) implied unit cost is ``min(l_extendedprice /
    l_quantity)`` over that supplier's shipped lines — ``min`` is
    association-order-free, so the correlated-minimum equality selection is
    deterministic across engines (unlike an avg of doubles).

    Shape = TPC-H Q2's correlated scalar subquery: per-(part, supplier)
    aggregate, then per-part window minimum, keep rows equal to it. One
    shuffle on l_partkey covers the aggregate AND the window (same key);
    all dimension sides broadcast.
    """
    r = region.where(F.col("r_name") == region_name)
    n = nation.join(F.broadcast(r), nation.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    s = supplier.join(
        F.broadcast(n), supplier.s_nationkey == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    p = part.where(
        (F.col("p_size") == size) & (F.col("p_type") == p_type)
    ).select("p_partkey", "p_name")

    from pyspark.sql import Window as W

    cost = (
        lineitem.select("l_partkey", "l_suppkey",
                        (F.col("l_extendedprice") / F.col("l_quantity")).alias("_unit"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min("_unit").alias("supply_cost"))
    )
    min_w = W.partitionBy("p_partkey")
    return (
        cost.withColumn("_min_cost", F.min("supply_cost").over(min_w))
        .where(F.col("supply_cost") == F.col("_min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.round("supply_cost", 4).alias("supply_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(k)
    )


def q11_important_stock(
    lineitem: DataFrame, supplier: DataFrame, nation: DataFrame,
    nation_name: str = "NATION_3", fraction: float = 0.002,
) -> DataFrame:
    """Q11-style important stock, adapted: per-part "stock value" is the
    revenue shipped by suppliers of one nation (no partsupp). Keep parts
    whose value exceeds ``fraction`` of the nation's total — TPC-H Q11's
    HAVING > scalar-subquery shape, expressed as a broadcast one-row
    cross join. Sums accumulate in decimal so the threshold comparison
    can't straddle float association order between engines."""
    n = nation.where(F.col("n_name") == nation_name).select("n_nationkey")
    s = supplier.join(
        F.broadcast(n), supplier.s_nationkey == F.col("n_nationkey")
    ).select("s_suppkey")
    value = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).cast("decimal(18,4)")
    per_part = (
        lineitem.select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(value).alias("_val"))
    )
    total = per_part.agg(F.sum("_val").alias("_total"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("_val") > F.col("_total") * F.lit(fraction))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.round(F.col("_val").cast("double"), 2).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "ps_partkey")
    )


def q20_dominant_supplier(
    lineitem: DataFrame, part: DataFrame, supplier: DataFrame, nation: DataFrame,
    name_token: str = "red", nation_name: str = "NATION_3",
    date_from: str = "1996-01-01", date_to: str = "1997-01-01",
) -> DataFrame:
    """Q20-style supplier shortlist, adapted: "availqty > half of shipped"
    becomes "supplier shipped > half of the part's total for the year" (a
    dominant supplier of a token-named part). TPC-H Q20's nested IN
    subqueries become two aggregations on the SAME (l_partkey) shuffle key
    plus a semi-join chain up to the supplier dim — no subquery is ever
    re-scanned."""
    p = part.where(F.col("p_name").contains(name_token)).select("p_partkey")
    year = lineitem.where(
        (F.col("l_shipdate") >= date_from) & (F.col("l_shipdate") < date_to)
    ).join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    qty = F.sum(F.col("l_quantity").cast("decimal(18,4)"))
    per_supp = year.groupBy("l_partkey", "l_suppkey").agg(qty.alias("_sq"))
    per_part = year.groupBy(F.col("l_partkey").alias("_pk")).agg(qty.alias("_tq"))
    dominant = (
        per_supp.join(per_part, F.col("l_partkey") == F.col("_pk"))
        .where(F.col("_sq") > F.col("_tq") * F.lit(0.5))
        .select("l_suppkey")
    )
    n = nation.where(F.col("n_name") == nation_name).select("n_nationkey")
    return (
        supplier.join(F.broadcast(n), supplier.s_nationkey == F.col("n_nationkey"),
                      "left_semi")
        .join(dominant, F.col("s_suppkey") == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def q21_suppliers_who_kept_orders_waiting(
    lineitem: DataFrame, orders: DataFrame, supplier: DataFrame, nation: DataFrame,
    nation_name: str = "NATION_5", k: int = 100,
) -> DataFrame:
    """Q21-style lone-failing-supplier count, adapted: "late delivery"
    (no receipt/commit dates in the synthetic schema) becomes l_returnflag
    = 'R'. For finished orders, count per supplier the orders where THIS
    supplier returned, at least one OTHER supplier participated (EXISTS →
    inner join on per-order supplier stats), and no OTHER supplier
    returned (NOT EXISTS → the same per-order aggregate, zero other
    returns). Both quantifiers collapse into ONE per-order aggregate
    instead of two extra lineitem self-scans — same order-key shuffle."""
    f_orders = orders.where(F.col("o_orderstatus") == "F").select("o_orderkey")
    li = lineitem.select("l_orderkey", "l_suppkey", "l_returnflag").join(
        F.broadcast(f_orders), F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("_n_ret"),
    )
    failing = li.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    ).dropDuplicates()
    lone = (
        failing.join(per_order, "l_orderkey")
        .where((F.col("_n_supp") > 1) & (F.col("_n_ret") == 1))
    )
    n = nation.where(F.col("n_name") == nation_name).select("n_nationkey")
    s = supplier.join(
        F.broadcast(n), supplier.s_nationkey == F.col("n_nationkey"), "left_semi"
    ).select("s_suppkey", "s_name")
    return (
        lone.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(k)
    )
