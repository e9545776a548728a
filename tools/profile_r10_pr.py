"""Round-10: why did sf1 pagerank regress ~3x vs the r7 build?

The r8 rewrite (pre-partitioned serialized e_deg + explicit broadcast)
fixed the sf0.1 AQE-coalesce pathology, but the sf1 sweep shows
pagerank3 4.9 s (r7) -> 14.5 s (r10 isolated warm).  Four variants of
the round loop on the REGISTERED supplier graph, warm best-of-2:

A current            (repartition + serialized cuts + explicit broadcast)
B no-repart          (skip the e_deg repartition; broadcast regime only)
C no-repart, deser   (B + deserialized e_deg blocks)
D r7-style           (plain persists, AQE decides everything)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as em
from dataengineer_spark.session import build_session
from dataengineer_spark.tuning import lineage_cut


def loop(e_deg, nodes, n_nodes, damping=0.85, iterations=3, bcast=True):
    base = (1.0 - damping) / n_nodes
    ranks = nodes.select(
        "node", F.round(F.lit(1.0 / n_nodes), 12).alias("rank")
    )
    for _ in range(iterations):
        rhs = F.broadcast(ranks) if bcast else ranks
        contribs = e_deg.join(rhs, F.col("_src") == F.col("node")).select(
            F.col("_dst").alias("node"),
            F.round(F.col("rank") / F.col("_deg"), 14)
            .cast("decimal(38,14)")
            .alias("_c"),
        )
        new_ranks = contribs.groupBy("node").agg(
            F.round(base + damping * F.sum("_c").cast("double"), 12).alias(
                "rank"
            )
        )
        ranks = nodes.join(
            F.broadcast(new_ranks) if bcast else new_ranks, "node", "left"
        ).select(
            "node", F.coalesce("rank", F.round(F.lit(base), 12)).alias("rank")
        )
    return ranks.select("node", F.round("rank", 8).alias("rank"))


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    spark = build_session("profile_r10_pr")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def fresh_edges():
        return em._supplier_edges(spark, sf).select(
            F.col("src").alias("_src"), F.col("dst").alias("_dst")
        )

    n_edges = fresh_edges().count()
    print(f":: supplier graph edges at {sf}: {n_edges}", flush=True)

    def variant_A():
        e = lineage_cut(fresh_edges(), eager=False, serialized=True)
        deg = e.groupBy("_src").agg(F.count("*").alias("_deg"))
        n_parts = max(sc.defaultParallelism, e.rdd.getNumPartitions())
        e_deg = lineage_cut(
            e.join(deg, "_src").repartition(n_parts, "_src"),
            eager=False, serialized=True,
        )
        nodes = lineage_cut(
            e.select(F.col("_src").alias("node"))
            .unionAll(e.select(F.col("_dst").alias("node"))).distinct()
        )
        return e_deg, nodes, nodes.count()

    def variant_B():
        e = lineage_cut(fresh_edges(), eager=False, serialized=True)
        deg = e.groupBy("_src").agg(F.count("*").alias("_deg"))
        e_deg = lineage_cut(e.join(deg, "_src"), eager=False, serialized=True)
        nodes = lineage_cut(
            e.select(F.col("_src").alias("node"))
            .unionAll(e.select(F.col("_dst").alias("node"))).distinct()
        )
        return e_deg, nodes, nodes.count()

    def variant_C():
        e = lineage_cut(fresh_edges(), eager=False, serialized=True)
        deg = e.groupBy("_src").agg(F.count("*").alias("_deg"))
        e_deg = lineage_cut(e.join(deg, "_src"), eager=False)
        nodes = lineage_cut(
            e.select(F.col("_src").alias("node"))
            .unionAll(e.select(F.col("_dst").alias("node"))).distinct()
        )
        return e_deg, nodes, nodes.count()

    def variant_D():
        e = fresh_edges().persist()
        deg = e.groupBy("_src").agg(F.count("*").alias("_deg"))
        e_deg = e.join(deg, "_src").persist()
        nodes = lineage_cut(
            e.select(F.col("_src").alias("node"))
            .unionAll(e.select(F.col("_dst").alias("node"))).distinct()
        )
        return e_deg, nodes, nodes.count()

    for name, build, bcast in (
        ("A current", variant_A, True),
        ("B no-repart", variant_B, True),
        ("C no-repart deser", variant_C, True),
        ("D r7-style persist (AQE)", variant_D, False),
    ):
        walls = []
        for i in range(2):
            t0 = time.time()
            e_deg, nodes, n = build()
            loop(e_deg, nodes, n, bcast=bcast).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(round(time.time() - t0, 2))
            spark.catalog.clearCache()
        print(f":: {name}: {walls} (n_nodes-check ok)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
