"""Plan-tuning helpers.

``fan_out`` addresses a local/small-file artifact: a parquet file with one
row group scans as ONE task no matter what ``maxPartitionBytes`` says, so a
CPU-heavy map stage (regex chains, MinHash signatures, pandas UDFs) runs
single-threaded. The helper repartitions **only when** the scan's partition
count is below the session's parallelism — at production scale (100 TB =
hundreds of thousands of splits) it is a structural no-op, while on a
single-file local input it buys cores× speedup for one cheap shuffle of the
narrow projected input.

Use it at the *source* end of compute-bound stages, never mid-plan on bulk
intermediates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition up to the session default parallelism when the input is

    under-partitioned; identity otherwise."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def lineage_cut(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate lineage: reliable ``checkpoint`` when the session has a
    checkpoint dir configured, ``localCheckpoint`` otherwise.

    ``localCheckpoint`` stores blocks on executors — fast, zero shared
    storage, and exactly right on local[*] or when the caller can
    re-run the job on executor loss; its blocks are reclaimed by the
    ContextCleaner once the frame is garbage collected.  On a
    1000-executor cluster those blocks die with their executor and the
    frame becomes unreadable mid-job, so production deployments that
    care set ``spark.sparkContext.setCheckpointDir(hdfs_path)`` once
    and every lineage cut in the engine silently upgrades to the
    fault-tolerant form.  Semantics (values, partitioning, the frozen
    ``spark_partition_id`` assignments the percentile/PPS operators
    rely on) are identical either way.

    The reliable branch checkpoints THROUGH a transient cache and
    always eagerly: a bare ``Dataset.checkpoint`` computes the plan
    once for the action and AGAIN for the checkpoint-write job
    (RDD.doCheckpoint re-runs an unpersisted lineage), and a lazy
    reliable checkpoint — unlike ``localCheckpoint`` — does not cache,
    so multi-consumer callers (the rank-offset self-join) would
    recompute upstream work per consumer.  The cache is dropped as
    soon as the checkpoint file is the source of truth.  Checkpoint
    FILES are reclaimed on frame GC because the session factory sets
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (the
    Spark default of false would grow the dir for the app's lifetime);
    sessions not built by :mod:`dataengineer_spark.session` should set
    it too.
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        cached = df.persist()
        try:
            return cached.checkpoint(eager=True)
        finally:
            cached.unpersist()
    return df.localCheckpoint(eager=eager)


def array_lit(values) -> "Column":
    """Literal array column from a Python list (1-D numbers or 2-D nested).

    Built as ONE parsed SQL expression string instead of per-element
    ``F.lit`` calls: py4j pays a JVM round trip per element, which measured
    ~0.5 s of DRIVER time per 16×64 codebook — ~140× slower than letting
    the JVM parser build the same literal tree. Matters because query
    callables construct their plan on every invocation.
    """
    from pyspark.sql import functions as F

    def render(v) -> str:
        if isinstance(v, (list, tuple)):
            return "array(" + ",".join(render(x) for x in v) + ")"
        if v is None:
            # typed NULL element (pca_power_top's degenerate-state arrays:
            # a bare NULL in array() would type the array as VOID)
            return "CAST(NULL AS DOUBLE)"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, int):
            # bare integral literal: the parser picks INT when it fits,
            # BIGINT otherwise — same typing as F.lit on a Python int
            return str(v)
        f = float(v)
        if f != f:  # NaN: repr 'nan' is not a SQL literal
            return "CAST('NaN' AS DOUBLE)"
        if f == float("inf"):
            return "CAST('Infinity' AS DOUBLE)"
        if f == float("-inf"):
            return "CAST('-Infinity' AS DOUBLE)"
        return repr(f) + "D"

    return F.expr(render(list(values)))
