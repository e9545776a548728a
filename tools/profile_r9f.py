"""Job/stage timeline of one q_prep_decontaminate run via the UI REST API."""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataengineer_spark.session import build_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(
        "profile_r9f", extra_conf={"spark.ui.enabled": "true"}
    )
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
    fn = qs["q_prep_decontaminate"]
    # warm run
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    before = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs"))
    n_before = len(before)

    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0

    jobs = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs"))
    new = [j for j in jobs if j["jobId"] >= n_before]
    new.sort(key=lambda j: j["jobId"])
    print(f"wall {wall:.3f}s, {len(new)} jobs")
    from datetime import datetime

    def ts(s):
        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    t_first = min(ts(j["submissionTime"]) for j in new)
    for j in new:
        sub = ts(j["submissionTime"]) - t_first
        dur = ts(j["completionTime"]) - ts(j["submissionTime"]) if j.get("completionTime") else -1
        print(f"  job {j['jobId']:4d} +{sub:7.3f}s dur {dur:7.3f}s tasks {j['numTasks']:4d}  {j['name'][:80]}")
        stages = j.get("stageIds", [])
        for sid in stages:
            try:
                st = json.load(urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{app}/stages/{sid}"))
                for attempt in st:
                    if attempt.get("status") != "COMPLETE":
                        continue
                    d = (ts(attempt["completionTime"]) - ts(attempt["firstTaskLaunchedTime"])
                         if attempt.get("firstTaskLaunchedTime") else -1)
                    print(f"    stage {sid:4d} dur {d:7.3f}s tasks {attempt['numTasks']:4d} "
                          f"in {attempt['inputBytes']>>20}MB out {attempt['shuffleWriteBytes']>>20}MB  "
                          f"{attempt['name'][:60]}")
            except Exception:
                pass


if __name__ == "__main__":
    main()
