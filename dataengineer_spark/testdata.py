"""Loaders for the driver synthetic tables (TESTDATA.md / FIXTURES.md §A).

One normalization applies: ``events.ts`` is nanosecond-precision in parquet,
which a vanilla Spark parquet scan refuses (PARQUET_TYPE_ILLEGAL); it is
read here with an explicit long-typed schema (``schemas.EVENTS_RAW``) and
floored to microseconds — exactly the value DuckDB reports for the same
file, so oracle comparisons line up (SURVEY.md §7.4.6).  No session conf is
required: every loader works in any SparkSession, including the external
correctness driver's.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Defensive: the caller may hand us a foreign SparkSession (the
    # correctness driver does).  Timestamp results must not depend on that
    # session's zone — pin UTC, matching the TZ-naive DuckDB oracle and
    # session.build_session's own default.  Runtime-settable, idempotent.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Size shuffle parallelism to the test scale when the session still has
    # Spark's out-of-the-box 200 (a tuned session is left alone).  Batch
    # plans mostly coalesce under AQE, but STREAMING state stores don't:
    # every stateful operator materializes one state store per shuffle
    # partition, and 200 of them made each gate streaming query ~4× slower.
    # DELIBERATE session-global seam for the conf-less driver contract; a
    # session that was intentionally tuned TO 200 is indistinguishable
    # from the default and gets re-sized — pick any other value (or set
    # SPARK_GRAFT_CPUS=200) to opt out.
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        spark.conf.set(
            "spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32")
        )
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts precision varies across testdata generations: µs with
        # isAdjustedToUTC=false (reads as TIMESTAMP_NTZ in a vanilla
        # session) or ns (vanilla read throws PARQUET_TYPE_ILLEGAL; a
        # session with spark.sql.legacy.parquet.nanosAsLong surfaces an
        # ns-long).  Normalize every case to a UTC TimestampType column
        # with µs values matching what DuckDB reports for the same file —
        # no session conf needed, so this works in ANY SparkSession,
        # including the correctness driver's.
        from pyspark.errors.exceptions.captured import AnalysisException

        from dataengineer_spark.schemas import EVENTS_RAW

        try:
            df = spark.read.parquet(path)
            dt = df.schema["ts"].dataType
            if isinstance(dt, T.TimestampType):
                return df
            if isinstance(dt, T.TimestampNTZType):
                # naive wall clock == DuckDB's naive value; session TZ is
                # pinned UTC above, so the cast is value-preserving
                return df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
            if isinstance(dt, T.LongType):
                # nanosAsLong session reading an ns file
                return df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
        except AnalysisException:
            pass
        # vanilla session + ns file: explicit long schema, floor to µs
        df = spark.read.schema(EVENTS_RAW).parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Temp views named as in the DuckDB oracle."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def normalized_sf_dir(spark: SparkSession, sf_dir: str, out_dir: str) -> str:
    """Materialize a shadow scale-factor dir with ``events`` rewritten as a
    µs-normalized parquet (every other table symlinked in place).

    The raw testdata events file stores ns timestamps, so every query pays
    a schema-read + floor-to-µs conversion; a production lake would land
    µs-native. Benching against this copy measures the queries, not the
    ingest normalization (VERDICT r1 item 8). Safe to call repeatedly.
    """
    os.makedirs(out_dir, exist_ok=True)
    for name in TABLES:
        dst = os.path.join(out_dir, f"{name}.parquet")
        if os.path.lexists(dst):
            if name == "events" and not os.path.exists(
                os.path.join(dst, "_SUCCESS")
            ):
                # interrupted prior materialization: a partial directory
                # without the commit marker must not be trusted
                shutil.rmtree(dst, ignore_errors=True)
            else:
                continue
        if name == "events":
            # write to a temp location, rename into place on success, so
            # a killed run never leaves a truncated-but-present table
            tmp = dst + "._tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            load_table(spark, sf_dir, "events").write.parquet(tmp)
            os.rename(tmp, dst)
        else:
            # abspath: a relative sf_dir would make the symlink resolve
            # relative to out_dir and dangle
            os.symlink(
                os.path.abspath(os.path.join(sf_dir, f"{name}.parquet")), dst
            )
    return out_dir
