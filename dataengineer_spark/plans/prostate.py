"""Prostate fan-out/fan-in pipeline (SURVEY.md §3.3).

The reference DAG (prostate_dag.py:314-319) fanned a cleaned batch into 6
parallel prediction branches merged at the end (19-column output,
:180-200). Spark mapping (O2): ``cache()`` the shared upstream once,
derive each branch lazily, fan-in with a keyed multi-join — Spark's
scheduler runs the branch subtrees in one job graph; Airflow's 6 worker
processes disappear.

Branch bodies in the reference were mostly stubs; the engine implements the
two evidenced behaviors (QA/regex sectionization feeding per-section
predictions, and the constant rule classifier prostate_dag.py:167-177) and
deterministic stand-ins for the rest, keeping the dataflow shape exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataengineer_spark.operators.joins import fanin_merge
from dataengineer_spark.schemas import PROSTATE_PRED_FIELDS


_STANDIN_MULT = 2654435761  # Knuth multiplicative-hash constant


def _standin_branch(segments: DataFrame, field: str, salt: int) -> DataFrame:
    """Deterministic stand-in prediction branch: arithmetic hash of

    (msgid, filtered-text length, per-branch salt) → code string + score —
    same 2-column contract as the reference's branch outputs, and plain
    integer arithmetic so the DuckDB oracle can replicate it exactly
    (SURVEY.md §5.2.2)."""
    h = F.pmod(
        F.col("msgid") * _STANDIN_MULT
        + F.length(F.coalesce(F.col("filtered_message"), F.lit("")))
        + salt,
        F.lit(1_000_000),
    )
    return segments.select(
        F.col("msgid").alias("msg_id"),
        F.pmod(h, F.lit(100)).cast("string").alias(field),
        (F.pmod(h, F.lit(1000)).cast("double") / 1000.0).alias(f"{field}_pred_score"),
    )


def constant_branch(segments: DataFrame) -> DataFrame:
    """The implemented reference branch (prostate_dag.py:167-177):

    prostate is always site C61.9 / behaviour 3 / laterality 00, score 1.0.
    """
    return segments.select(
        F.col("msgid").alias("msg_id"),
        F.lit("C61.9").alias("site_code"),
        F.lit(1.0).alias("site_code_pred_score"),
        F.lit("3").alias("behaviour_code"),
        F.lit(1.0).alias("behaviour_code_pred_score"),
        F.lit("00").alias("laterality"),
        F.lit(1.0).alias("laterality_pred_score"),
    )


def run_prostate(segments: DataFrame) -> DataFrame:
    """Fan-out 6 branches over the cached segments, fan-in on msg_id.

    Output: msg_id + 9 prediction/score pairs (reference
    prostate_dag.py:180-200)."""
    segments = segments.cache()
    constant_fields = {"site_code", "behaviour_code", "laterality"}
    standin_fields = [f for f in PROSTATE_PRED_FIELDS if f not in constant_fields]
    branches = [constant_branch(segments)] + [
        _standin_branch(segments, f, salt) for salt, f in enumerate(standin_fields)
    ]
    out = fanin_merge(branches, on="msg_id", how="outer")
    ordered = ["msg_id"] + [
        c for f in PROSTATE_PRED_FIELDS for c in (f, f"{f}_pred_score")
    ]
    return out.select(*ordered)
