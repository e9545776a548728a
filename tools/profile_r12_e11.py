"""Round-12 E11 streaming decomposition probe.

Runs each E11 query in isolation (bench methodology) while capturing the
StreamingQuery objects via a DataStreamWriter.start hook, then prints each
micro-batch's durationMs breakdown (addBatch / getBatch / queryPlanning /
walCommit / commitOffsets ...) plus the wall around the whole query — so
the per-query fixed streaming overhead is attributed, not guessed.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as em  # noqa: E402
from dataengineer_spark.session import build_session  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or [
        "q_e11_stream_join",
        "q_e11_stream_neardup_arrow",
        "q_e11_stream_neardup_live",
        "q_e11_stream_session",
        "q_e11_stream_dedup",
        "q_e11_stream_hll",
        "q_e11_stream_anomaly",
        "q_e11_stateful",
        "q_e11_stream_tumbling",
        "q_e11_stream_lake",
        "q_e11_stream_decontaminate",
    ]
    spark = build_session("profile_r12_e11")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from dataengineer_spark.testdata import TABLES, load_table, normalized_sf_dir
    import tempfile

    sf = "/root/testdata/sf0.1"
    shadow = os.path.join(tempfile.gettempdir(), "spark_graft_lake_sf0.1")
    sf_dir = normalized_sf_dir(spark, sf, shadow)
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    from pyspark.sql.streaming.readwriter import DataStreamWriter

    captured: list = []
    orig_start = DataStreamWriter.start

    def patched(self, *a, **k):
        q = orig_start(self, *a, **k)
        captured.append(q)
        return q

    DataStreamWriter.start = patched

    qs = em.queries()
    for name in names:
        for attempt in range(2):  # warm second run is the reported one
            captured.clear()
            gc.collect()
            spark.catalog.clearCache()
            for rdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()
            ):
                rdd.unpersist()
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.time() - t0
        print(f"== {name}: wall={wall:.3f}s, {len(captured)} stream(s)")
        for q in captured:
            for p in q.recentProgress:
                dur = p["durationMs"]
                rows = p.get("numInputRows")
                print(
                    f"   batch {p['batchId']}: rows={rows} "
                    + " ".join(f"{k}={v}" for k, v in sorted(dur.items()))
                )
    print(json.dumps({"done": names}))
    spark.stop()


if __name__ == "__main__":
    main()
