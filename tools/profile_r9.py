"""Round-9 profiling: isolate the xxhash-family bench regression.

Times the four regressed queries (VERDICT r8 item 1) under fan_out
variants, best-of-3 warm runs each, noop sink:
  v0_current   — code as committed
  v1_identity  — fan_out is a no-op (the r7 behaviour)
  v2_noprobe   — fan_out always repartitions (no .rdd partition probe)

The delta v0−v1 is the total fan_out cost; v0−v2 isolates the .rdd
plan-materialization probe from the repartition shuffle itself.
"""
from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from dataengineer_spark.session import build_session
from dataengineer_spark import tuning

QUERIES = [
    "q_prep_decontaminate",
    "q_e2_minhash_neardup",
    "q_e2_neardup_recall",
    "q_e2_dup_spans_hashed",
]

_orig_fan_out = tuning.fan_out


def fan_identity(df, min_partitions=None):
    return df


def fan_noprobe(df, min_partitions=None):
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    return df.repartition(min_partitions or sc.defaultParallelism)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("profile_r9")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from dataengineer_spark.testdata import TABLES, load_table, normalized_sf_dir
    import tempfile

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    shadow = os.path.join(tempfile.gettempdir(), f"spark_graft_lake_{sf_name}")
    sf_dir = normalized_sf_dir(spark, sf_dir, shadow)
    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    qs = entrymod.queries()

    def drop_blocks() -> None:
        gc.collect()
        spark.catalog.clearCache()
        try:
            for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
                rdd.unpersist()
        except Exception:
            pass

    def run_once(fn) -> float:
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    variants = [
        ("v0_current", _orig_fan_out),
        ("v1_identity", fan_identity),
        ("v2_noprobe", fan_noprobe),
    ]
    results: dict[str, dict[str, float]] = {q: {} for q in QUERIES}
    for vname, impl in variants:
        tuning.fan_out = impl
        for q in QUERIES:
            fn = qs[q]
            best = min(run_once(fn) for _ in range(3))
            results[q][vname] = round(best, 3)
            drop_blocks()
    tuning.fan_out = _orig_fan_out

    print(f"{'query':32s} " + " ".join(f"{v:>12s}" for v, _ in variants))
    for q in QUERIES:
        print(f"{q:32s} " + " ".join(f"{results[q][v]:12.3f}" for v, _ in variants))


if __name__ == "__main__":
    main()
