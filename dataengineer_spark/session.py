"""SparkSession factory.

The reference ran single-node ``airflow standalone`` with one OS process per
task (reference Dockerfile:14-16, SURVEY.md §6); here one SparkSession hosts
the whole pipeline graph. Defaults are tuned so the same code is correct on
``local[N]`` for tests and sane on a multi-executor cluster:

- AQE on (runtime partition coalescing + skew-join splitting) so the static
  ``spark.sql.shuffle.partitions`` choice is a ceiling, not a bet.
- Arrow on: every pandas UDF / ``toPandas`` boundary is columnar-batched.
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle (which is UTC-naive) and are deployment-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # reliable-checkpoint files (tuning.lineage_cut's fault-tolerant
    # branch, active when a checkpoint dir is set) are deleted when the
    # owning frame is garbage collected — Spark's default (false) keeps
    # every checkpoint for the app's lifetime and an iterative operator
    # would grow the dir without bound
    "spark.cleaner.referenceTracking.cleanCheckpoints": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # parquet scans: keep partitions near 128MB so a 100 TB table splits into
    # ~800k tasks, not 8 giant ones; local tests never hit the cap anyway.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # auto-broadcast small dims (reference collected config tables on the
    # driver and re-applied them per row — dx_group.py:179-183); 64MB is
    # roomy for dimension tables while keeping executor memory safe.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # nanosecond parquet timestamps (events.ts) surface as ns-longs; the
    # testdata loader converts to TimestampType (µs, floor) — matching what
    # DuckDB reports for the same files (FIXTURES.md precision warning)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.ui.enabled": "false",
    # local[N] puts driver and executors in ONE JVM whose default heap is
    # 1g — far too small next to the 64MB broadcast threshold once a long
    # session accumulates broadcast refs (a 70-query bench loop OOMed the
    # build side of a broadcast exchange).  Only read at JVM launch; a
    # cluster launcher's --driver-memory simply overrides it.
    # (SPARK_GRAFT_DRIVER_MEM is resolved in build_session, at call time —
    # an env var set after import must not be silently ignored.)
}


def _cluster_master_configured() -> bool:
    """True when a launcher already chose the master — never force local then.

    Before the py4j gateway attaches, ``SparkConf()`` is dict-backed and
    ``contains("spark.master")`` is always False even under
    ``spark-submit --master yarn`` — so checking it alone would clobber a
    cluster master with local[N].  The launcher's intent IS visible pre-JVM
    through the environment: ``spark-submit`` exports the master via
    ``PYSPARK_SUBMIT_ARGS`` and a driver-side gateway via
    ``PYSPARK_GATEWAY_PORT``/``SECRET``; ``MASTER``/``SPARK_MASTER`` are the
    documented env fallbacks SparkContext itself honours.  Once a JVM is
    live (re-entrant getOrCreate), the system property check works too.
    """
    env = os.environ
    if "--master" in env.get("PYSPARK_SUBMIT_ARGS", ""):
        return True
    if env.get("PYSPARK_GATEWAY_PORT") or env.get("PYSPARK_GATEWAY_SECRET"):
        # launched by spark-submit: the JVM holds the launcher's conf and
        # getOrCreate will inherit it — don't override.
        return True
    if env.get("MASTER") or env.get("SPARK_MASTER"):
        return True
    from pyspark import SparkConf, SparkContext

    if SparkContext._active_spark_context is not None:
        return True
    try:
        if SparkContext._jvm is not None and SparkConf().contains(
            "spark.master"
        ):
            return True
    except Exception:  # pragma: no cover - defensive: conf probe only
        pass
    return False


def build_session(
    app_name: str = "dataengineer_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    ONLY when no cluster master is configured — on a real cluster the
    launcher sets ``--master`` (visible as the ``spark.master`` system
    property) and this argument is left None; forcing local there would
    silently run the whole job single-node on the driver.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    elif not _cluster_master_configured():
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        builder = builder.master(f"local[{cpus}]")
    conf = dict(_DEFAULTS)
    conf["spark.driver.memory"] = os.environ.get(
        "SPARK_GRAFT_DRIVER_MEM", "8g"
    )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_session(spark: SparkSession) -> None:
    spark.stop()
