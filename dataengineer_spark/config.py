"""Typed run parameters (replaces Airflow ``Param`` blocks — O5).

The reference declared typed, enum-constrained, defaulted run parameters via
Airflow ``Param`` (reference dx_group.py:273-285,
diagnostic_group_pipeline_with_api.py:328-349, prostate_dag.py:216-243).
Here the same contract is a dataclass validated at session start; invalid
configs fail before any Spark job is submitted.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime

DB_TYPES = ("parquet", "postgres", "sql-server")
PART_OF_REPORT_DOMAIN = ("entire report", "gross_or_micro", "diag_or_add")


def _check_yyyymmdd(value: str, name: str) -> None:
    # strptime('%Y%m%d') also accepts 6/7-char strings ('202212' parses
    # as 2022-01-02!) — an 8-char check is required before the parse for
    # the lexicographic window comparison downstream to be meaningful
    if len(value) != 8 or not value.isdigit():
        raise ValueError(
            f"{name} must be an 8-digit 'YYYYMMDD' string, got {value!r}"
        )
    try:
        datetime.strptime(value, "%Y%m%d")
    except ValueError as exc:
        raise ValueError(f"{name} must be a 'YYYYMMDD' string, got {value!r}") from exc


@dataclass(frozen=True)
class RunConfig:
    """Validated pipeline run parameters.

    Mirrors the parameter surface of the reference DAGs (source location,
    date window, model selection, output table) minus credentials-in-params,
    which SURVEY.md §7.6 lists as an explicit non-goal.
    """

    pipeline_name: str = "dx_group"
    source: str = ""  # path (csv/parquet dir) or table name, per db_type
    db_type: str = "parquet"
    date_column: str = "date"
    date_from: str = "20220101"  # 'YYYYMMDD' at the edge (F6), DateType inside
    date_to: str = "20291231"
    model_name: str = "standin_hash16"
    model_version: str = "1"
    output_table: str = "prediction_table"
    comment: str = ""
    options: dict[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.db_type not in DB_TYPES:
            raise ValueError(f"db_type must be one of {DB_TYPES}, got {self.db_type!r}")
        _check_yyyymmdd(self.date_from, "date_from")
        _check_yyyymmdd(self.date_to, "date_to")
        if self.date_from > self.date_to:
            raise ValueError(f"date_from {self.date_from} > date_to {self.date_to}")

    @property
    def audit_comment(self) -> str:
        """Audit-string construction (F8, reference dx_group.py:95)."""
        if self.comment:
            return self.comment
        params = {
            "pipeline_name": self.pipeline_name,
            "date_from": self.date_from,
            "date_to": self.date_to,
            "model_name": self.model_name,
            "model_version": self.model_version,
        }
        return f"Pipeline ran with parameters : {params}"
