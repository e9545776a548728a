"""DX-Group classification pipeline (SURVEY.md §3.1).

The reference ran this as three Airflow tasks — clean (reference
dx_group.py:68-135) → prep (:138-195) → predict (:199-263) — each in its
own OS process, round-tripping the full dataset through Postgres between
tasks. Here the whole DAG is ONE driver program building one lazy plan;
the only materializations are the three contract outputs (``cleaned_data``,
``preped_data``, ``prediction_table``), written batch-partitioned to the
lake. XCom disappears: ``batch_id`` is a plain Python int.

The plan is embarrassingly parallel (map stages + broadcast lookups) — no
shuffle anywhere, so it scales linearly with input partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataengineer_spark.batch import BatchAllocator, BatchContext, stamp_batch
from dataengineer_spark.catalog import Catalog
from dataengineer_spark.config import RunConfig
from dataengineer_spark.functions.cleaning import clean_msg
from dataengineer_spark.functions.labels import split_label
from dataengineer_spark.functions.sections import sectionize
from dataengineer_spark.functions.truncate import truncate_text_chars
from dataengineer_spark.ml.inference import standin_classifier


def clean_stage(source: DataFrame, batch_id: int, id_col: str = "msgid",
                msg_col: str = "message") -> DataFrame:
    """Stage 1 — clean_data: normalize text, stamp lineage, project the

    cleaned_data contract (batch_id, msgid, msg).  try_cast: a single
    non-numeric id from a CSV/REST edge yields NULL (quarantine
    upstream if needed) rather than an ANSI CAST_INVALID_INPUT that
    kills the whole batch — the labels.split_label bad-row policy."""
    return stamp_batch(
        source.select(
            F.col(id_col).try_cast("bigint").alias("msgid"),
            clean_msg(msg_col).alias("msg"),
        ),
        batch_id,
    ).select("batch_id", "msgid", "msg")


def prep_stage(cleaned: DataFrame, patterns: dict[str, str] | None = None) -> DataFrame:
    """Stage 2 — prep_data: sectionize into the preped_data contract."""
    return sectionize(cleaned, "msg", patterns).select(
        "batch_id", "msgid", "gross", "addendum", "diagnosis",
        "diagnosis_comment", "micro", "filtered_message", "part_of_report",
    )


def predict_stage(
    preped: DataFrame,
    model_id: int,
    classifier: Column | None = None,
    char_budget: int = 2000,
) -> DataFrame:
    """Stage 3 — predict: truncate → classify → parse label suffix →

    stamp model_id → prediction_table contract."""
    truncated = preped.withColumn(
        "model_input",
        truncate_text_chars("filtered_message", "part_of_report", char_budget),
    )
    pred = classifier if classifier is not None else standin_classifier(F.col("model_input"))
    return (
        truncated.withColumn("_pred", pred)
        .select(
            "batch_id",
            "msgid",
            split_label(F.col("_pred.predicted_label")).alias("predicted_label"),
            F.col("_pred.model_score").alias("model_score"),
            F.lit(model_id).cast("bigint").alias("model_id"),
        )
    )


def run_dx_group(
    catalog: Catalog,
    config: RunConfig,
    source: DataFrame,
    model_id: int = 1,
    patterns: dict[str, str] | None = None,
    persist: bool = True,
) -> tuple[BatchContext, DataFrame]:
    """End-to-end DX-Group run: allocate batch → clean → prep → predict.

    Returns (batch context, predictions). ``persist=False`` keeps it one
    pure lazy plan (for tests/oracles); with persist the three contract
    tables land in the lake partitioned by batch_id, and downstream stages
    read back the stored partition — matching the reference's task
    isolation semantics while pruning to one partition.
    """
    ctx = BatchAllocator(catalog).open_batch(config)
    cleaned = clean_stage(source, ctx.batch_id)
    if persist:
        catalog.write(cleaned, "cleaned_data")
        cleaned = catalog.read_batch("cleaned_data", ctx.batch_id)
    preped = prep_stage(cleaned, patterns)
    if persist:
        catalog.write(preped, "preped_data")
        preped = catalog.read_batch("preped_data", ctx.batch_id)
    predictions = predict_stage(preped, model_id)
    if persist:
        catalog.write(predictions, "prediction_table")
        predictions = catalog.read_batch("prediction_table", ctx.batch_id)
    return ctx, predictions
