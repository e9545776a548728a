"""Graph-family 100x scale probe (VERDICT r9 item 3): triangles + BFS
at sf0.1 and the synthesized sf10 in ONE session.

The graph family is the one operator set whose scale posture was argued
from plan shape, never measured (pagerank was probed in r9; triangles
8.4 s / BFS 7.0 s are the #5/#6 full-tier walls).  The probe runs the
REGISTERED queries (`q_graph_triangles`, `q_graph_bfs` — the part
co-purchase graph off lineitem) at both scales and records:

- wall, spill (UI REST, diffed per run), plan summary (joins/exchanges)
- the edge-work numbers the wall should track: n_edges, n_wedges,
  n_triangles (triangles emits them as its output row) and per-level
  frontier sizes (BFS output grouped by dist)
- wall / n_wedges (triangles) and wall / edge-frontier work (BFS) at
  both scales — a plan that survives 100x shows this ratio roughly
  FLAT, because the co-purchase degree distribution is scale-invariant
  (orders-per-part and lines-per-order don't grow with corpus size, so
  edges and wedges grow ~linearly with lineitem).

Run:  SPARK_GRAFT_DRIVER_MEM=48g python tools/graph_probe_sf10.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from dataengineer_spark.session import build_session
from dataengineer_spark.testdata import normalized_sf_dir
from tools.plan_report import plan_of, summarize
from tools.scale_probe_sf10 import SF10_RAW, spill_totals


def main() -> None:
    spark = build_session(
        "graph_probe_sf10", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm
    tmp = tempfile.gettempdir()
    sf01 = normalized_sf_dir(
        spark, "/root/testdata/sf0.1", os.path.join(tmp, "spark_graft_lake_sf0.1")
    )
    sf10 = normalized_sf_dir(
        spark, SF10_RAW, os.path.join(tmp, "spark_graft_lake_sf10")
    )
    qs = entrymod.queries()
    out = {}

    # --- triangles: output row IS the edge-work census -----------------
    rec = {}
    for tag, sf_dir in (("sf0.1", sf01), ("sf10", sf10)):
        m0, d0 = spill_totals(ui)
        t0 = time.time()
        frame = qs["q_graph_triangles"](spark, sf_dir)
        row = frame.collect()[0].asDict()
        wall = round(time.time() - t0, 2)
        m1, d1 = spill_totals(ui)
        plan = summarize(plan_of(frame))
        rec[tag] = {
            "wall_s": wall,
            "n_edges": row["n_edges"],
            "n_wedges": row["n_wedges"],
            "n_triangles": row["n_triangles"],
            "ns_per_wedge": round(wall * 1e9 / max(row["n_wedges"], 1), 1),
            "spill_mem_mb": round(max(m1 - m0, 0) / 1e6, 1) if m0 >= 0 else None,
            "spill_disk_mb": round(max(d1 - d0, 0) / 1e6, 1) if d0 >= 0 else None,
            "joins": plan["joins"],
            "exchanges": plan["exchanges"],
        }
        spark.catalog.clearCache()
        print(json.dumps({"triangles": {tag: rec[tag]}}), flush=True)
    rec["wall_ratio"] = round(
        rec["sf10"]["wall_s"] / max(rec["sf0.1"]["wall_s"], 1e-9), 1
    )
    rec["wedge_ratio"] = round(
        rec["sf10"]["n_wedges"] / max(rec["sf0.1"]["n_wedges"], 1), 1
    )
    rec["plan_shape_same"] = rec["sf0.1"]["joins"] == rec["sf10"]["joins"]
    out["triangles"] = rec

    # --- BFS: frontier sizes come out of the distance table ------------
    rec = {}
    for tag, sf_dir in (("sf0.1", sf01), ("sf10", sf10)):
        m0, d0 = spill_totals(ui)
        t0 = time.time()
        frame = qs["q_graph_bfs"](spark, sf_dir)
        # one action; frontiers are lazily lineage-cut inside
        # bfs_distances so the level counts don't re-expand the DAG
        levels = {
            int(r["dist"]): int(r["n"])
            for r in frame.groupBy("dist")
            .agg(entrymod.F.count("*").alias("n"))
            .collect()
        }
        wall = round(time.time() - t0, 2)
        m1, d1 = spill_totals(ui)
        plan = summarize(plan_of(frame))
        reached = sum(levels.values())
        rec[tag] = {
            "wall_s": wall,
            "frontier_sizes": [levels.get(i, 0) for i in sorted(levels)],
            "n_reached": reached,
            "us_per_reached_node": round(wall * 1e6 / max(reached, 1), 2),
            "spill_mem_mb": round(max(m1 - m0, 0) / 1e6, 1) if m0 >= 0 else None,
            "spill_disk_mb": round(max(d1 - d0, 0) / 1e6, 1) if d0 >= 0 else None,
            "joins": plan["joins"],
            "exchanges": plan["exchanges"],
        }
        spark.catalog.clearCache()
        print(json.dumps({"bfs": {tag: rec[tag]}}), flush=True)
    rec["wall_ratio"] = round(
        rec["sf10"]["wall_s"] / max(rec["sf0.1"]["wall_s"], 1e-9), 1
    )
    rec["reached_ratio"] = round(
        rec["sf10"]["n_reached"] / max(rec["sf0.1"]["n_reached"], 1), 1
    )
    rec["plan_shape_same"] = rec["sf0.1"]["joins"] == rec["sf10"]["joins"]
    out["bfs"] = rec

    print(json.dumps({"graph_probe_sf10": out}))
    spark.stop()


if __name__ == "__main__":
    main()
