"""Edge-case semantics of the TPC-H-shaped composite plans on tiny frames.

The sf0.01 oracle gate covers bulk values; these pin behaviors the hash can
miss: zero-order customers surviving Q13's outer join, max-revenue ties in
Q15, Q4's semi join not multiplying orders with several matching lines, and
Q22's anti join + positive-balance average.
"""

from __future__ import annotations

from dataengineer_spark.plans import analytics as A


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_q13_zero_order_customers_survive(spark):
    customer = _df(spark, [(1,), (2,), (3,)], "c_custkey long")
    orders = _df(
        spark,
        [(10, 1, "1-URGENT"), (11, 1, "5-LOW"), (12, 2, "2-HIGH")],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    out = {
        r["c_count"]: r["custdist"]
        for r in A.q13_customer_distribution(customer, orders).collect()
    }
    # customer 3 has no orders at all; customer 1's 5-LOW order is excluded
    # by the join condition (not by dropping the customer)
    assert out == {1: 2, 0: 1}


def test_q15_returns_all_tied_max_suppliers(spark):
    lineitem = _df(
        spark,
        [
            (1, "1996-01-05", 100.0, 0.0),
            (2, "1996-01-06", 100.0, 0.0),
            (3, "1996-01-07", 50.0, 0.0),
            (1, "1999-01-01", 999.0, 0.0),  # outside the quarter
        ],
        "l_suppkey long, l_shipdate string, l_extendedprice double, l_discount double",
    ).selectExpr(
        "l_suppkey", "cast(l_shipdate as timestamp) l_shipdate",
        "l_extendedprice", "l_discount",
    )
    supplier = _df(
        spark, [(1, "s1"), (2, "s2"), (3, "s3")], "s_suppkey long, s_name string"
    )
    rows = A.q15_top_supplier(lineitem, supplier).collect()
    assert sorted(r["s_suppkey"] for r in rows) == [1, 2]
    assert all(r["total_revenue"] == 100.0 for r in rows)


def test_q4_semi_join_counts_orders_not_lines(spark):
    orders = _df(
        spark,
        [(1, "1996-02-01", "1-URGENT"), (2, "1996-02-01", "1-URGENT")],
        "o_orderkey long, o_orderdate string, o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "cast(o_orderdate as timestamp) o_orderdate", "o_orderpriority"
    )
    # order 1 has THREE returned lines — must still count once
    lineitem = _df(
        spark,
        [(1, "R"), (1, "R"), (1, "R"), (2, "N")],
        "l_orderkey long, l_returnflag string",
    )
    rows = A.q4_order_priority(orders, lineitem).collect()
    assert [(r["o_orderpriority"], r["order_count"]) for r in rows] == [("1-URGENT", 1)]


def test_q22_anti_join_and_positive_avg(spark):
    customer = _df(
        spark,
        [(1, 0, 100.0), (2, 0, 200.0), (3, 0, -50.0), (4, 9, 999.0)],
        "c_custkey long, c_nationkey int, c_acctbal double",
    )
    orders = _df(
        spark,
        [(10, 2, "2001-05-01"), (11, 1, "1999-01-01")],
        "o_orderkey long, o_custkey long, o_orderdate string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "cast(o_orderdate as timestamp) o_orderdate"
    )
    # avg positive balance among nations (0..6) = (100+200)/2 = 150; customer 2
    # is above it but has a recent order → anti-joined away; customer 4 is in
    # an excluded nation; nobody remains above threshold without recent orders
    rows = A.q22_dormant_customers(customer, orders).collect()
    assert rows == []

    # drop the recent order → customer 2 qualifies
    rows = A.q22_dormant_customers(
        customer, orders.where("o_orderdate < timestamp'2000-01-01'")
    ).collect()
    assert [(r["c_nationkey"], r["numcust"], r["totacctbal"]) for r in rows] == [
        (0, 1, 200.0)
    ]


def test_q1_aggregate_columns(spark):
    lineitem = _df(
        spark,
        [
            ("A", "F", "1996-01-01", 2.0, 10.0, 0.1, 0.05),
            ("A", "F", "1996-01-02", 4.0, 20.0, 0.0, 0.00),
            ("R", "O", "2001-01-01", 1.0, 5.0, 0.0, 0.00),  # past cutoff
        ],
        "l_returnflag string, l_linestatus string, l_shipdate string, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double",
    ).selectExpr(
        "l_returnflag", "l_linestatus", "cast(l_shipdate as timestamp) l_shipdate",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    )
    rows = A.q1_pricing_summary(lineitem, cutoff="2000-12-01").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["l_returnflag"], r["l_linestatus"]) == ("A", "F")
    assert r["sum_qty"] == 6.0
    assert r["sum_base_price"] == 30.0
    assert r["sum_disc_price"] == 29.0  # 10*0.9 + 20
    assert r["sum_charge"] == 29.45  # 9*1.05 + 20
    assert r["count_order"] == 2


def test_q2_keeps_all_min_cost_ties_per_part(spark):
    lineitem = _df(
        spark,
        # part 100: supplier 1 and 2 tie at unit cost 10.0; supplier 3 is 20
        [(100, 1, 20.0, 2.0), (100, 2, 10.0, 1.0), (100, 3, 40.0, 2.0),
         # part 200: only supplier 3
         (200, 3, 15.0, 1.0)],
        "l_partkey long, l_suppkey long, l_extendedprice double, l_quantity double",
    )
    part = _df(spark, [(100, "alpha"), (200, "beta")],
               "p_partkey long, p_name string").selectExpr(
        "p_partkey", "p_name", "cast(19 as int) p_size", "'LARGE' p_type")
    supplier = _df(spark, [(1, "s1", 10.0, 0), (2, "s2", 20.0, 0), (3, "s3", 5.0, 0)],
                   "s_suppkey long, s_name string, s_acctbal double, s_nationkey int")
    nation = _df(spark, [(0, "N0", 0)],
                 "n_nationkey int, n_name string, n_regionkey int")
    region = _df(spark, [(0, "EUROPE")], "r_regionkey int, r_name string")
    rows = A.q2_min_cost_supplier(lineitem, part, supplier, nation, region).collect()
    got = {(r["p_partkey"], r["s_name"]): r["supply_cost"] for r in rows}
    # both tied min-cost suppliers survive for part 100; part 200 trivially kept
    assert got == {(100, "s1"): 10.0, (100, "s2"): 10.0, (200, "s3"): 15.0}
    # ordered by s_acctbal desc
    assert [r["s_name"] for r in rows] == ["s2", "s1", "s3"]


def test_q11_threshold_is_share_of_total(spark):
    lineitem = _df(
        spark,
        [(1, 1, 98.0, 0.0), (2, 1, 1.0, 0.0), (3, 1, 1.0, 0.0)],
        "l_partkey long, l_suppkey long, l_extendedprice double, l_discount double",
    )
    supplier = _df(spark, [(1, 0)], "s_suppkey long, s_nationkey int")
    nation = _df(spark, [(0, "NATION_3")], "n_nationkey int, n_name string")
    rows = A.q11_important_stock(lineitem, supplier, nation, fraction=0.5).collect()
    # only part 1 (98% of value) exceeds half the nation total
    assert [(r["ps_partkey"], r["part_value"]) for r in rows] == [(1, 98.0)]


def test_q20_dominant_supplier_strictly_over_half(spark):
    lineitem = _df(
        spark,
        # part 1: supplier 1 ships 60 of 100 (dominant), supplier 2 ships 40
        # part 2: suppliers split 50/50 — nobody dominant (strict >)
        [(1, 1, 60.0, "1996-06-01"), (1, 2, 40.0, "1996-06-01"),
         (2, 1, 50.0, "1996-06-01"), (2, 2, 50.0, "1996-06-01")],
        "l_partkey long, l_suppkey long, l_quantity double, l_shipdate string",
    ).selectExpr("l_partkey", "l_suppkey", "l_quantity",
                 "cast(l_shipdate as timestamp) l_shipdate")
    part = _df(spark, [(1, "red bolt"), (2, "red ring")],
               "p_partkey long, p_name string")
    supplier = _df(spark, [(1, "s1", 0), (2, "s2", 0)],
                   "s_suppkey long, s_name string, s_nationkey int")
    nation = _df(spark, [(0, "NATION_3")], "n_nationkey int, n_name string")
    rows = A.q20_dominant_supplier(lineitem, part, supplier, nation).collect()
    assert [(r["s_suppkey"], r["s_name"]) for r in rows] == [(1, "s1")]


def test_q21_lone_failing_supplier_in_multi_supplier_order(spark):
    lineitem = _df(
        spark,
        # order 1: suppliers 1(R), 2(N) → supplier 1 is the lone failer
        # order 2: suppliers 1(R), 2(R) → two failers, nobody counted
        # order 3: supplier 1(R) alone  → single-supplier, not counted
        [(1, 1, "R"), (1, 2, "N"), (2, 1, "R"), (2, 2, "R"), (3, 1, "R")],
        "l_orderkey long, l_suppkey long, l_returnflag string",
    )
    orders = _df(spark, [(1, "F"), (2, "F"), (3, "F")],
                 "o_orderkey long, o_orderstatus string")
    supplier = _df(spark, [(1, "s1", 0), (2, "s2", 0)],
                   "s_suppkey long, s_name string, s_nationkey int")
    nation = _df(spark, [(0, "NATION_5")], "n_nationkey int, n_name string")
    rows = A.q21_suppliers_who_kept_orders_waiting(
        lineitem, orders, supplier, nation
    ).collect()
    assert [(r["s_name"], r["numwait"]) for r in rows] == [("s1", 1)]
