"""Loaders for the driver synthetic tables (TESTDATA.md / FIXTURES.md §A).

One normalization applies: ``events.ts`` is nanosecond-precision in parquet,
which Spark surfaces as an ns-long (``spark.sql.legacy.parquet.nanosAsLong``,
set by the session factory); it is floored to microseconds here — exactly
the value DuckDB reports for the same file, so oracle comparisons line up
(SURVEY.md §7.4.6).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Temp views named as in the DuckDB oracle."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
