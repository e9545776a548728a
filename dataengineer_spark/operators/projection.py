"""Projection / filter / column operators (P1–P9, S4's predicate, P2's SQL).

The reference built SELECT strings by concatenation (``create_sql`` at
reference dx_group.py:39-46) and executed them in Postgres; here the same
shapes are declarative DataFrame expressions, so projection pruning and
predicate pushdown reach the parquet scan automatically (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def project(df: DataFrame, columns: list[str]) -> DataFrame:
    """P1 — ``data[cols]`` (reference dx_group.py:120)."""
    return df.select(*columns)


def select_where(
    df: DataFrame, columns: list[str] | None = None, conditions: list[Column] | None = None
) -> DataFrame:
    """P2 — the engine's version of ``create_sql(table, columns, conditions)``

    (reference dx_group.py:39-46): conjunction of predicates + projection,
    as a plan instead of a SQL string. Filter applied before projection so
    predicates may reference non-projected columns, as SQL WHERE does.
    """
    out = df
    if conditions:
        for cond in conditions:
            out = out.where(cond)
    if columns:
        out = out.select(*columns)
    return out


def eq_filter(df: DataFrame, **equalities) -> DataFrame:
    """P3 — equality-conjunction filter (``batch_id={id}`` /

    ``model_name='x' and model_version='y'``, reference dx_group.py:153,161).
    On a batch-partitioned layout an equality on ``batch_id`` is partition
    pruning, not a scan-and-filter.
    """
    out = df
    for name, value in equalities.items():
        out = out.where(F.col(name) == value)
    return out


def date_range(df: DataFrame, date_column: str, date_from, date_to) -> DataFrame:
    """P4/S4 — ``date_column BETWEEN from AND to`` (reference

    Diagnostic_group_pipeline.py:76-78)."""
    return df.where(F.col(date_column).between(date_from, date_to))


def with_literals(df: DataFrame, **values) -> DataFrame:
    """P5 — add constant columns (``data['batch_id'] = batch_id``,

    reference dx_group.py:119; constant predictions prostate_dag.py:172-177).
    """
    out = df
    for name, value in values.items():
        out = out.withColumn(name, value if isinstance(value, Column) else F.lit(value))
    return out


def rename_all(df: DataFrame, new_names: list[str]) -> DataFrame:
    """P6 — bulk positional rename (``df.columns = [...]``, reference

    diagnostic_group_pipeline_with_api.py:313)."""
    if len(new_names) != len(df.columns):
        raise ValueError(
            f"rename_all: {len(df.columns)} columns but {len(new_names)} names"
        )
    return df.toDF(*new_names)


def cast_column(df: DataFrame, column: str, dtype: str) -> DataFrame:
    """P7 — ``astype('int64')`` (reference

    diagnostic_group_pipeline_with_api.py:309)."""
    return df.withColumn(column, F.col(column).cast(dtype))


def drop_nulls(df: DataFrame, how: str = "any", subset: list[str] | None = None) -> DataFrame:
    """P8 — ``dropna(how='any')`` (reference mvp_pipe.py:44-45)."""
    return df.na.drop(how=how, subset=subset)


def expand_struct(df: DataFrame, struct_col: str) -> DataFrame:
    """P9 — struct → top-level columns in one select; the distributed-safe

    replacement for pandas index-aligned horizontal concat (reference
    dx_group.py:185-189; SURVEY.md §7.4.2)."""
    return df.select("*", f"{struct_col}.*").drop(struct_col)
