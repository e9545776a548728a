"""Round-10 A/B: wedge-join vs edge-iterator triangle census, warm,
same session, sf0.1 co-purchase graph. Also times the edge build alone
so the operator cost is read net of its input."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from dataengineer_spark.session import build_session
from dataengineer_spark.operators import graph as g
from dataengineer_spark.tuning import fan_out, tie_lifetime, transient_persist


def wedge_form(edges):
    """The pre-r10 wedge-join census (inline copy for A/B only)."""
    e = transient_persist(
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    counts = deg.agg(
        F.count("*").alias("n_nodes"),
        F.shiftright(F.sum(F.col("d") * (F.col("d") - 1)), 1)
        .cast("bigint")
        .alias("n_wedges"),
    )
    n_edges = e.agg(F.count("*").alias("n_edges"))
    wedges = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(F.col("e1.a").alias("x"), F.col("e2.b").alias("z"))
    )
    tri = wedges.join(
        e.select(F.col("a").alias("x"), F.col("b").alias("z")),
        ["x", "z"],
        "left_semi",
    ).agg(F.count("*").alias("n_triangles"))
    out = counts.crossJoin(F.broadcast(n_edges)).crossJoin(F.broadcast(tri))
    return tie_lifetime(out.select("n_nodes", "n_edges", "n_wedges",
                                   "n_triangles"), e)


def edges_of(spark, sf_dir):
    li = fan_out(
        entrymod.load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
    )
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("src"),
                F.col("b.l_partkey").alias("dst"))
        .distinct()
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session("profile_r10_tri")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # edge build alone (what both forms pay before the census)
    for i in range(2):
        t0 = time.time()
        edges_of(spark, sf_dir).write.format("noop").mode("overwrite").save()
        print(f"edge_build run{i}: {time.time()-t0:.2f}s", flush=True)

    for name, fn in (("edge_iterator", g.triangle_stats),
                     ("wedge_join", wedge_form)):
        for i in range(2):
            t0 = time.time()
            row = fn(edges_of(spark, sf_dir)).collect()[0]
            print(f"{name} run{i}: {time.time()-t0:.2f}s "
                  f"tri={row['n_triangles']}", flush=True)
            spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
