"""r7 code vs r8 code, same session, AQE on: is the regression in dedup.py?"""
from __future__ import annotations

import gc
import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataengineer_spark.session import build_session
from dataengineer_spark.operators import dedup as D8
from dataengineer_spark.tuning import fan_out

spec = importlib.util.spec_from_file_location("dedup_r7", "/tmp/r7mod/dedup_r7.py")
D7 = importlib.util.module_from_spec(spec)
spec.loader.exec_module(D7)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("profile_r9h")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from dataengineer_spark.testdata import load_table, normalized_sf_dir
    import tempfile

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    shadow = os.path.join(tempfile.gettempdir(), f"spark_graft_lake_{sf_name}")
    sf_dir = normalized_sf_dir(spark, sf_dir, shadow)
    raw = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    raw.count()
    docs = fan_out(raw)
    bench = docs.where(F.col("doc_id") % 50 == 7).select(
        F.col("doc_id").alias("bench_id"), "text"
    )

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
        print(f"{label:56s} {best:8.3f}", flush=True)

    t("r7 minhash_lsh_join (decon)", lambda: D7.minhash_lsh_join(docs, bench, threshold=0.5))
    t("r8 minhash_lsh_join (decon)", lambda: D8.minhash_lsh_join(docs, bench, threshold=0.5))
    d1k = docs.where(F.col("doc_id") < 1000)
    t("r7 minhash_lsh_pairs", lambda: D7.minhash_lsh_pairs(
        d1k, "doc_id", "text", shingle_size=5, num_hashes=32, bands=4, threshold=0.5))
    t("r8 minhash_lsh_pairs", lambda: D8.minhash_lsh_pairs(
        d1k, "doc_id", "text", shingle_size=5, num_hashes=32, bands=4, threshold=0.5))


if __name__ == "__main__":
    main()
