"""Round-12 (optimization round) per-query isolation harness.

Times registered queries in ISOLATION with the same methodology as
bench.py (noop sink = full compute, no driver materialization; block
hygiene between runs) so per-query walls are comparable to the bench
tiers but free of cross-query cache pressure.  Optionally dumps each
query's ``explain("formatted")`` to ``plans/r12/<q>_<tag>.txt`` — the
before/after evidence files for OPTIMIZATION_r12.md.

Usage::

    python tools/profile_r12.py [--sf DIR] [--runs N] [--plans TAG] q1 q2 ...
    python tools/profile_r12.py --top 20          # 20 slowest headline
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as em  # noqa: E402
from dataengineer_spark.session import build_session  # noqa: E402


def drop_blocks(spark) -> None:
    gc.collect()
    spark.catalog.clearCache()
    try:
        for t in spark.catalog.listTables():
            if t.isTemporary and t.name.startswith(
                ("stream_", "stateful_", "anomaly_")
            ):
                spark.catalog.dropTempView(t.name)
    except Exception:  # noqa: BLE001
        pass
    try:
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist()
    except Exception:  # noqa: BLE001
        pass


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None, metavar="TAG",
                    help="dump explain(formatted) to plans/r12/<q>_<TAG>.txt")
    ap.add_argument("--top", type=int, default=0,
                    help="profile the N slowest headline queries per the "
                         "latest BENCH_DETAIL instead of naming them")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names = list(args.queries)
    if args.top:
        import glob
        detail = sorted(glob.glob(os.path.join(repo, "BENCH_DETAIL_r[0-9]*.json")))
        detail = [d for d in detail if "_sf" not in os.path.basename(d)][-1]
        qmap = json.load(open(detail))["queries"]
        names += [k for k, _ in sorted(qmap.items(), key=lambda kv: -kv[1])[: args.top]]

    spark = build_session("profile_r12")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from dataengineer_spark.testdata import TABLES, load_table, normalized_sf_dir
    import tempfile

    sf_name = os.path.basename(args.sf.rstrip("/"))
    shadow = os.path.join(tempfile.gettempdir(), f"spark_graft_lake_{sf_name}")
    sf_dir = normalized_sf_dir(spark, args.sf, shadow)
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    qs = em.queries()
    plan_dir = os.path.join(repo, "plans", "r12")
    if args.plans:
        os.makedirs(plan_dir, exist_ok=True)

    results: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        walls = []
        for _ in range(args.runs):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
            drop_blocks(spark)
        results[name] = walls
        if args.plans:
            try:
                df = fn(spark, sf_dir)
                plan = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")
                )
                with open(os.path.join(plan_dir, f"{name}_{args.plans}.txt"),
                          "w") as fh:
                    fh.write(plan)
            except Exception as exc:  # noqa: BLE001
                print(f"{name}: plan dump failed: {exc!r}", file=sys.stderr)
            drop_blocks(spark)
        spark.sparkContext.setJobDescription(None)
        print(f"{name:42s} best={min(walls):7.3f}  runs={walls}", flush=True)

    print(json.dumps({k: min(v) for k, v in results.items()}, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
