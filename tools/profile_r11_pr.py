"""Round-11 opt: decompose q_graph_pagerank's per-round wall at sf0.1.

Variants over the REGISTERED supplier co-occurrence graph, warm
best-of-N with block hygiene (bench methodology):

  edges    edge build alone (self-join + distinct) to noop
  full5    registered pagerank(iterations=5)
  full3    registered pagerank(iterations=3)
  full1    registered pagerank(iterations=1)
  noleft5  5 rounds WITHOUT the per-round teleport-floor left join
           (wrong values — isolates the left-join broadcast stage cost)
  noaqe5   registered pagerank(iterations=5) with AQE off (diagnostic)
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


def drop_blocks(spark) -> None:
    gc.collect()
    spark.catalog.clearCache()
    try:
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist()
    except Exception:  # noqa: BLE001
        pass


def noleft_loop(e_deg, nodes, n_nodes, iterations=5, damping=0.85):
    base = (1.0 - damping) / n_nodes
    ranks = nodes.select("node", F.round(F.lit(1.0 / n_nodes), 12).alias("rank"))
    for _ in range(iterations):
        contribs = e_deg.join(F.broadcast(ranks), F.col("_src") == F.col("node")).select(
            F.col("_dst").alias("node"),
            F.round(F.col("rank") / F.col("_deg"), 14)
            .cast("decimal(38,14)")
            .alias("_c"),
        )
        ranks = contribs.groupBy("node").agg(
            F.round(base + damping * F.sum("_c").cast("double"), 12).alias("rank")
        )
    return ranks.select("node", F.round("rank", 8).alias("rank"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build_session("profile_r11_pr")
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
        print(f"{tag:10s} best={min(walls):7.3f} runs={walls}", flush=True)

    edges = lambda: em._supplier_edges(spark, sf_dir)  # noqa: E731

    timed("edges", edges)
    timed("full5", lambda: graph_ops.pagerank(edges(), iterations=5))
    timed("full3", lambda: graph_ops.pagerank(edges(), iterations=3))
    timed("full1", lambda: graph_ops.pagerank(edges(), iterations=1))

    def noleft():
        e = lineage_cut(
            edges().select(F.col("src").alias("_src"), F.col("dst").alias("_dst")),
            eager=False, serialized=True,
        )
        deg = e.groupBy("_src").agg(F.count("*").alias("_deg"))
        nodes = lineage_cut(
            e.select(F.col("_src").alias("node"))
            .unionAll(e.select(F.col("_dst").alias("node")))
            .distinct()
        )
        n = nodes.count()
        e_deg = lineage_cut(
            e.join(deg, "_src").repartition(32, "_src"), eager=False, serialized=True
        )
        return noleft_loop(e_deg, nodes, n, iterations=5)

    timed("noleft5", noleft)

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    timed("noaqe5", lambda: graph_ops.pagerank(edges(), iterations=5))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()


if __name__ == "__main__":
    main()
