"""Isolate the banding stage cost: does CollapseProject re-evaluate the
minhash aggregate per element_at reference (8 bands x rows refs)?

Variants:
  sig only                 — baseline
  banded (current)         — _band_buckets directly over the sig select
  banded + lineage barrier — localCheckpoint the sig frame first (forces
                             one evaluation, then banding reads columns)
  banded + expr barrier    — re-select _sig through a no-collapse barrier
"""
from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataengineer_spark.session import build_session
from dataengineer_spark.operators import dedup as D
from dataengineer_spark.tuning import fan_out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("profile_r9d")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from dataengineer_spark.testdata import load_table, normalized_sf_dir
    import tempfile

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    shadow = os.path.join(tempfile.gettempdir(), f"spark_graft_lake_{sf_name}")
    sf_dir = normalized_sf_dir(spark, sf_dir, shadow)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").alias("_t")
    )
    docs.count()
    fanned = fan_out(docs)

    def drop_blocks() -> None:
        gc.collect()
        spark.catalog.clearCache()
        try:
            for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
                rdd.unpersist()
        except Exception:
            pass

    def t(label, builder, n=3) -> None:
        best = None
        for _ in range(n):
            t0 = time.time()
            builder().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            drop_blocks()
        print(f"{label:52s} {best:8.3f}")

    def sig_frame():
        return fanned.select(
            "doc_id",
            D.minhash_from_hashes(
                D.char_shingle_hashes(F.col("_t"), 5, False), 32
            ).alias("_sig"),
        )

    t("sig only", sig_frame)
    t("banded (current)", lambda: D._band_buckets(sig_frame(), "doc_id", 32, 8))

    def banded_barrier():
        # barrier that CollapseProject cannot cross: repartition between
        # the sig projection and the banding projection
        return D._band_buckets(
            sig_frame().repartition(spark.sparkContext.defaultParallelism),
            "doc_id", 32, 8,
        )

    t("banded + repartition barrier", banded_barrier)

    # full decontaminate with barrier'd banding on both sides
    bench = docs.where(F.col("doc_id") % 50 == 7).select(
        F.col("doc_id").alias("bench_id"), F.col("_t")
    )
    print("explain of banded (current):")
    plan = D._band_buckets(sig_frame(), "doc_id", 32, 8)
    import re
    txt = plan._sc._jvm.PythonSQLUtils.explainString(
        plan._jdf.queryExecution(), "formatted"
    ) if hasattr(plan._sc._jvm, "PythonSQLUtils") else ""
    n_agg = len(re.findall(r"aggregate\(", plan._jdf.queryExecution().optimizedPlan().toString()))
    print("aggregate( occurrences in optimized plan:", n_agg)


if __name__ == "__main__":
    main()
