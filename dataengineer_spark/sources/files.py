"""File sources/sinks: CSV scan (S1) and CSV sink (K3).

The reference read CSVs with ``pd.read_csv`` — one variant with
``encoding='latin-1', na_values=''`` (reference dx_group.py:93,
mvp_pipe.py:44) — and wrote with ``to_csv`` (mvp_pipe.py:33,62). Here the
scan is distributed and schema-first: ``inferSchema`` only when no schema is
given (ingest-boundary convenience, SURVEY.md §1.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    encoding: str = "UTF-8",
    header: bool = True,
    empty_as_null: bool = True,
) -> DataFrame:
    """S1 — CSV scan. ``encoding='ISO-8859-1'`` reproduces the latin-1

    variant; ``empty_as_null`` reproduces ``na_values=''``."""
    reader = (
        spark.read.option("header", header)
        .option("encoding", encoding)
        .option("emptyValue", None if empty_as_null else "")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True, single_file: bool = False
) -> None:
    """K3 — CSV sink. ``single_file`` coalesces to one part for parity with

    ``to_csv`` (only sane for export-sized results, not bulk data)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", header).csv(path)
