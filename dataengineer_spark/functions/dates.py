"""Date parse/format (F6).

The reference stored dates as 'YYYYMMDD' strings and re-parsed them at every
boundary (``format_date`` at reference dx_group.py:64-65,78-79;
prostate_dag.py:44-45). Engine policy (SURVEY.md §1.4): DateType inside,
'YYYYMMDD' strings only at the edges.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# strptime → Spark datetime-pattern equivalents for formats the reference
# actually passed ("%Y%m%d", "%Y-%m-%d" style params)
_STRPTIME_TO_SPARK = {
    "%Y%m%d": "yyyyMMdd",
    "%Y-%m-%d": "yyyy-MM-dd",
    "%d/%m/%Y": "dd/MM/yyyy",
    "%m/%d/%Y": "MM/dd/yyyy",
    "%Y-%m-%d %H:%M:%S": "yyyy-MM-dd HH:mm:ss",
}


def _spark_fmt(fmt: str) -> str:
    return _STRPTIME_TO_SPARK.get(fmt, fmt)


def format_date(col: Column | str, fmt: str = "%Y%m%d") -> Column:
    """``strptime(date, fmt).strftime('%Y%m%d')`` as one expression.

    ``try_to_date``: a malformed/empty date string yields NULL instead
    of an ANSI SparkDateTimeException — a single bad row must not kill
    a 100 TB run (same policy as labels.split_label's try_cast)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(F.try_to_date(c, _spark_fmt(fmt)), "yyyyMMdd")


def parse_yyyymmdd(col: Column | str) -> Column:
    """Edge string → DateType; malformed → NULL (try_to_date, same
    bad-row policy as format_date)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_date(c, "yyyyMMdd")
