"""10x scale probe (SCALE.md evidence): run the heaviest / most
scale-critical registered queries at sf0.1 and at the generated sf1
(tools/gen_sf1.py) in ONE session and print wall + ratio per query.
A plan that survives 10x shows ~linear wall growth; a quadratic or
compile-constant-dominated plan shows up immediately in the ratio.

Also confirms the guarded-quadratic contract: at sf1 the embeddings
table (20k rows) exceeds QUADRATIC_ROW_LIMIT, so the exact all-pairs
baseline must REFUSE to plan rather than launch an O(n^2) cartesian.
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

PROBE = [
    "q_e3_pca_power",
    "q_e3_ivfpq_trained",
    "q_e3_ivfpq_stored",
    "q_e3_ivfpq_topk",
    "q_a10_bradley_terry",
    "q_k9_quarantine",
    "q_e2_incremental_neardup_arrow",
    "q_e11_stream_neardup_arrow",
    "q_e2_minhash_neardup",
    "q_e2_embed_lsh_neardup",
    "q_j5_salted_join",
    "q_e7_grouptopk_salted",
    "q_e9_sorted_blocking",
    "q_tpch_q9",
    "q_tpch_q21",
]


def bench_one(spark, fn, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    spark.catalog.clearCache()
    return round(best, 2)


def main() -> None:
    spark = build_session("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    tmp = tempfile.gettempdir()
    sf01 = normalized_sf_dir(
        spark, "/root/testdata/sf0.1", os.path.join(tmp, "spark_graft_lake_sf0.1")
    )
    sf1 = normalized_sf_dir(
        spark, "/tmp/spark_graft_sf1", os.path.join(tmp, "spark_graft_lake_sf1")
    )
    qs = entrymod.queries()
    out = {}
    for name in PROBE:
        w01 = bench_one(spark, qs[name], sf01)
        w1 = bench_one(spark, qs[name], sf1)
        out[name] = {"sf0.1": w01, "sf1": w1, "ratio": round(w1 / max(w01, 1e-9), 2)}
        print(json.dumps({name: out[name]}), flush=True)
    # guarded-quadratic contract at 20k embeddings rows
    try:
        qs["q_e2_embed_neardup"](spark, sf1).write.format("noop").mode(
            "overwrite"
        ).save()
        guard = "FAILED-TO-GUARD"
    except ValueError as exc:
        guard = f"refused as designed: {str(exc)[:80]}"
    print(json.dumps({"q_e2_embed_neardup@sf1": guard}), flush=True)
    print(json.dumps({"probe": out}))
    spark.stop()


if __name__ == "__main__":
    main()
