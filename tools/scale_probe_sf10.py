"""100x scale probe (SCALE.md §round-8 evidence): run the 5 heaviest
scale shapes at sf0.1 and at the generated sf10 (tools/gen_sf10.py —
NEW synthesized content, not clones) in ONE session and print wall,
SPILL (memory+disk bytes from the UI REST API, diffed per run) and the
plan-shape summary per query at both scales.

A plan that survives two decades shows at-or-below-linear wall growth,
zero (or bounded, explained) spill, and the SAME structural plan —
no broadcast demotion to SortMerge on a dim side, no shape change.

The probe set is VERDICT r7 item 5's: q_e2_minhash_neardup UNCAPPED
(the registered query caps at doc_id<1000; here the full 5M-doc corpus
goes through shingle→signature→band-join→verify), q_e9_sorted_blocking
(1.5M customers), q_j5_salted_join (60M x 15M), q_k8_shard_export
(5M-doc lake write + manifest read-back), q_tpch_q9 (60M lineitem).

Run:  SPARK_GRAFT_DRIVER_MEM=48g python tools/scale_probe_sf10.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from dataengineer_spark.session import build_session
from dataengineer_spark.testdata import normalized_sf_dir
from tools.plan_report import plan_of, summarize

SF10_RAW = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/spark_graft_sf10")


def minhash_uncapped(spark, sf_dir):
    """q_e2_minhash_neardup without the doc_id<1000 literal cap: the
    full corpus through the banded LSH pipeline."""
    from dataengineer_spark.operators import dedup as dedup_ops

    docs = entrymod._docs(spark, sf_dir)
    return dedup_ops.minhash_lsh_pairs(
        docs, "doc_id", "text", shingle_size=5, num_hashes=32, bands=4,
        threshold=0.5,
    )


def spill_totals(ui: str) -> tuple[int, int]:
    try:
        apps = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=10)
        )
        app = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages", timeout=30
            )
        )
        mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
        dsk = sum(s.get("diskBytesSpilled", 0) for s in stages)
        return mem, dsk
    except Exception:
        return -1, -1  # UI unavailable: record as unknown, don't die


def main() -> None:
    spark = build_session(
        "scale_probe_sf10", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    tmp = tempfile.gettempdir()
    sf01 = normalized_sf_dir(
        spark, "/root/testdata/sf0.1", os.path.join(tmp, "spark_graft_lake_sf0.1")
    )
    sf10 = normalized_sf_dir(
        spark, SF10_RAW, os.path.join(tmp, "spark_graft_lake_sf10")
    )
    qs = entrymod.queries()
    probe = [
        ("minhash_uncapped", minhash_uncapped),
        ("q_e9_sorted_blocking", qs["q_e9_sorted_blocking"]),
        ("q_j5_salted_join", qs["q_j5_salted_join"]),
        ("q_k8_shard_export", qs["q_k8_shard_export"]),
        ("q_tpch_q9", qs["q_tpch_q9"]),
    ]
    out = {}
    for name, fn in probe:
        rec = {}
        for tag, sf_dir in (("sf0.1", sf01), ("sf10", sf10)):
            m0, d0 = spill_totals(ui)
            t0 = time.time()
            frame = fn(spark, sf_dir)
            frame.write.format("noop").mode("overwrite").save()
            wall = round(time.time() - t0, 2)
            m1, d1 = spill_totals(ui)
            # plan from the SAME frame that ran (effectful builds like
            # shard_export must not run twice just for the plan)
            plan = summarize(plan_of(frame))
            rec[tag] = {
                "wall_s": wall,
                "spill_mem_mb": round(max(m1 - m0, 0) / 1e6, 1)
                if m0 >= 0 else None,
                "spill_disk_mb": round(max(d1 - d0, 0) / 1e6, 1)
                if d0 >= 0 else None,
                "joins": plan["joins"],
                "exchanges": plan["exchanges"],
                "pushdown": plan["pushdown"],
            }
            spark.catalog.clearCache()
            print(json.dumps({name: {tag: rec[tag]}}), flush=True)
        rec["ratio"] = round(
            rec["sf10"]["wall_s"] / max(rec["sf0.1"]["wall_s"], 1e-9), 1
        )
        rec["plan_shape_same"] = (
            rec["sf0.1"]["joins"] == rec["sf10"]["joins"]
        )
        out[name] = rec
        print(json.dumps({name: {"ratio": rec["ratio"],
                                 "plan_same": rec["plan_shape_same"]}}),
              flush=True)
    print(json.dumps({"probe_sf10": out}))
    spark.stop()


if __name__ == "__main__":
    main()
