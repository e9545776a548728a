"""Driver-latency attack: AQE on/off x cut/no-cut for the regressed queries."""
from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataengineer_spark.session import build_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("profile_r9g")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from dataengineer_spark.testdata import TABLES, load_table, normalized_sf_dir
    import tempfile

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    shadow = os.path.join(tempfile.gettempdir(), f"spark_graft_lake_{sf_name}")
    sf_dir = normalized_sf_dir(spark, sf_dir, shadow)
    for t_ in TABLES:
        load_table(spark, sf_dir, t_).count()
    import __spark_entry__ as entrymod
    qs = entrymod.queries()

    def drop_blocks() -> None:
        gc.collect()
        spark.catalog.clearCache()
        try:
            for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
                rdd.unpersist()
        except Exception:
            pass

    def t(label, fn, n=3) -> float:
        best = None
        for _ in range(n):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            drop_blocks()
        print(f"{label:56s} {best:8.3f}", flush=True)
        return best

    names = ["q_prep_decontaminate", "q_e2_minhash_neardup",
             "q_e2_neardup_recall", "q_e2_dup_spans_hashed"]
    for aqe in ("true", "false"):
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        for nm in names:
            t(f"aqe={aqe} {nm}", qs[nm])
    spark.conf.set("spark.sql.adaptive.enabled", "true")


if __name__ == "__main__":
    main()
