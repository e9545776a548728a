"""Round-11 opt experiment 2: pagerank edge build + fused teleport floor.

Variants (same session, warm best-of-N, bench methodology):

  edgesA   registered _supplier_edges (fan_out + self-join + distinct)
  edgesB   collect_set-per-order + in-partition pair explode + distinct
           (same distinct edge set, one scan, no broadcast build)
  prA      registered pagerank(5) over edgesA          [baseline]
  prB      registered pagerank(5) over edgesB
  prBF     pagerank-with-FUSED-floor(5) over edgesB:
           contribs UNION zero-decimal row per node -> one groupBy; the
           all-zero groups land exactly on round(base,12) (bit-identical
           to the left-join coalesce) and the per-round left-join +
           broadcast stages disappear (3 AQE stages/round -> 2)
  eqcheck  prBF values == registered pagerank values (must be True)
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as em
from dataengineer_spark.session import build_session
from dataengineer_spark.tuning import lineage_cut
from dataengineer_spark.testdata import load_table


def drop_blocks(spark) -> None:
    gc.collect()
    spark.catalog.clearCache()
    try:
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist()
    except Exception:  # noqa: BLE001
        pass


def edges_b(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    per_order = li.groupBy("l_orderkey").agg(
        F.collect_set("l_suppkey").alias("ss")
    )
    return (
        per_order.select(
            F.explode("ss").alias("src"), F.col("ss").alias("_ss")
        )
        .select("src", F.explode("_ss").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def pagerank_fused(edges, damping=0.85, iterations=5):
    """Broadcast-regime loop with the floor fused into the aggregate."""
    e = lineage_cut(
        edges.select(F.col("src").alias("_src"), F.col("dst").alias("_dst")),
        eager=False, serialized=True,
    )
    deg = e.groupBy("_src").agg(F.count("*").alias("_deg"))
    nodes = lineage_cut(
        e.select(F.col("_src").alias("node"))
        .unionAll(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    base = (1.0 - damping) / n_nodes
    n_parts = 32
    e_deg = lineage_cut(
        e.join(deg, "_src").repartition(n_parts, "_src"),
        eager=False, serialized=True,
    )
    ranks = nodes.select("node", F.round(F.lit(1.0 / n_nodes), 12).alias("rank"))
    zero = nodes.select(
        "node", F.lit(0).cast("decimal(38,14)").alias("_c")
    )
    for _ in range(iterations):
        contribs = (
            e_deg.join(F.broadcast(ranks), F.col("_src") == F.col("node"))
            .select(
                F.col("_dst").alias("node"),
                F.round(F.col("rank") / F.col("_deg"), 14)
                .cast("decimal(38,14)")
                .alias("_c"),
            )
        )
        ranks = (
            contribs.unionAll(zero)
            .groupBy("node")
            .agg(
                F.round(
                    base + damping * F.sum("_c").cast("double"), 12
                ).alias("rank")
            )
        )
    return ranks.select("node", F.round("rank", 8).alias("rank"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build_session("profile_r11_pr2")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from dataengineer_spark.operators import graph as graph_ops

    def timed(tag, build):
        walls = []
        for _ in range(runs):
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
            drop_blocks(spark)
        print(f"{tag:8s} best={min(walls):7.3f} runs={walls}", flush=True)

    timed("edgesA", lambda: em._supplier_edges(spark, sf_dir))
    timed("edgesB", lambda: edges_b(spark, sf_dir))
    timed("prA", lambda: graph_ops.pagerank(
        em._supplier_edges(spark, sf_dir), iterations=5))
    timed("prB", lambda: graph_ops.pagerank(edges_b(spark, sf_dir), iterations=5))
    timed("prBF", lambda: pagerank_fused(edges_b(spark, sf_dir), iterations=5))

    a = graph_ops.pagerank(em._supplier_edges(spark, sf_dir), iterations=5)
    bf = pagerank_fused(edges_b(spark, sf_dir), iterations=5)
    diff = a.join(bf, "node", "full").where(
        (a["rank"] != bf["rank"]) | a["rank"].isNull() | bf["rank"].isNull()
    )
    print("eqcheck diff rows:", diff.count())
    spark.stop()


if __name__ == "__main__":
    main()
