"""In-memory records → table (S6).

``pd.DataFrame.from_records(list_of_dicts)`` (reference
diagnostic_group_pipeline_with_api.py:103, prostate_dag.py:118-124) becomes
``spark.createDataFrame`` with an explicit schema. Driver-side by nature —
correct for API pages / config rows, never the bulk path (that's what the
partitioned REST fetch in ``rest.py`` is for).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def from_records(
    spark: SparkSession,
    records: Sequence[Mapping] | Sequence[tuple],
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """S6 — build a DataFrame from driver-side records."""
    if schema is not None:
        return spark.createDataFrame(list(records), schema=schema)
    return spark.createDataFrame(list(records))
