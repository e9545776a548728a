"""Head-to-head: r7 signature form (materialized shingles + per-shingle
xxhash, capture-inlined 32x rehash) vs r8 positional char_shingle_hashes
+ minhash_from_hashes, both fanned, xxhash AND portable families.
Also times the bare fan_out .rdd probe.
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
    spark = build_session("profile_r9c")
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
    print("natural partitions:", docs.rdd.getNumPartitions())

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

    t("old r7 form xxhash (shingle strings + fold)",
      lambda: fanned.select("doc_id", D.minhash_signature(
          D.char_shingles(F.col("_t"), 5), 32).alias("_sig")))
    t("new r8 form xxhash (positional + from_hashes)",
      lambda: fanned.select("doc_id", D.minhash_from_hashes(
          D.char_shingle_hashes(F.col("_t"), 5, False), 32).alias("_sig")))
    t("old r7 form portable",
      lambda: fanned.select("doc_id", D.minhash_signature(
          D.char_shingles(F.col("_t"), 5), 32, portable=True).alias("_sig")))
    t("new r8 form portable",
      lambda: fanned.select("doc_id", D.minhash_from_hashes(
          D.char_shingle_hashes(F.col("_t"), 5, True), 32).alias("_sig")))
    # hybrid: materialized shingle strings, hash to longs, distinct on
    # longs, then the clean from_hashes fold (no capture re-eval)
    t("hybrid xxhash (strings->xxhash64 distinct longs)",
      lambda: fanned.select("doc_id", D.minhash_from_hashes(
          F.array_distinct(F.transform(
              F.transform(
                  F.sequence(F.lit(1), F.greatest(
                      F.length("_t") - F.lit(4), F.lit(1))),
                  lambda i: F.col("_t").substr(i, F.lit(5)),
              ),
              lambda s: F.pmod(F.xxhash64(s), F.lit(D._MERSENNE)),
          )), 32).alias("_sig")))

    # cost of one fan_out probe on a plain scan and on a filtered scan
    for label, frame in [
        ("probe: plain scan", docs),
        ("probe: filtered scan", docs.where(F.col("doc_id") < 1000)),
        ("probe: post-repartition", fanned),
    ]:
        t0 = time.time()
        for _ in range(10):
            frame.rdd.getNumPartitions()
        print(f"{label:52s} {(time.time() - t0) / 10:8.3f}")


if __name__ == "__main__":
    main()
