"""Round-10 follow-up: re-time ONLY the sf10 triangles leg after the
shuffle-hash adjacency-join fix (the full probe's sf10 leg measured the
SMJ plan: 715 s, 43 GB disk spill)."""

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
from tools.scale_probe_sf10 import SF10_RAW, spill_totals


def main() -> None:
    spark = build_session(
        "graph_probe_sf10_tri_rerun", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    tmp = tempfile.gettempdir()
    sf10 = normalized_sf_dir(
        spark, SF10_RAW, os.path.join(tmp, "spark_graft_lake_sf10")
    )
    m0, d0 = spill_totals(ui)
    t0 = time.time()
    frame = entrymod.queries()["q_graph_triangles"](spark, sf10)
    row = frame.collect()[0].asDict()
    wall = round(time.time() - t0, 2)
    m1, d1 = spill_totals(ui)
    print(json.dumps({"triangles_sf10_shj": {
        "wall_s": wall,
        "n_edges": row["n_edges"],
        "n_wedges": row["n_wedges"],
        "n_triangles": row["n_triangles"],
        "ns_per_wedge": round(wall * 1e9 / max(row["n_wedges"], 1), 1),
        "spill_mem_mb": round(max(m1 - m0, 0) / 1e6, 1) if m0 >= 0 else None,
        "spill_disk_mb": round(max(d1 - d0, 0) / 1e6, 1) if d0 >= 0 else None,
    }}))
    spark.stop()


if __name__ == "__main__":
    main()
