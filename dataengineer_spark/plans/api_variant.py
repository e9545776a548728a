"""API-variant DX-Group pipeline (SURVEY.md §3.2).

Same three-stage skeleton as ``dx_group`` with the API deltas (reference
diagnostic_group_pipeline_with_api.py): REST source in, and on the way out
cast the parsed label to int64 (:309, P7), broadcast-join the ``labels``
dimension (:306-312, J1), rename to the export schema (:313, P6), write CSV
(:315, K3) and upload (:316, K4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataengineer_spark.operators.joins import label_join
from dataengineer_spark.operators.projection import rename_all
from dataengineer_spark.schemas import API_EXPORT_COLUMNS


def publish_stage(predictions: DataFrame, labels: DataFrame) -> DataFrame:
    """Predictions × labels dim → API export schema.

    Inner join (a prediction with no labels row drops — the reference's
    ``pd.merge`` default, diagnostic_group_pipeline_with_api.py:310).
    """
    joined = label_join(
        predictions.select(
            "batch_id", "msgid", "predicted_label", "model_score", "model_id"
        ),
        labels.select("label", "label_name"),
        fact_key="predicted_label",
        dim_key="label",
        how="inner",
        # labels is the engine-managed dim (non-null keys): null-safe
        # equality keeps Catalyst from re-evaluating the classifier chain
        # inside an inferred isnotnull filter
        dim_key_nonnull=True,
    )
    export = joined.select(
        "batch_id", "msgid", "predicted_label", "model_score", "model_id",
        "label_name",
    )
    return rename_all(export, API_EXPORT_COLUMNS)


def run_dx_group_api(
    catalog,
    config,
    source: DataFrame,
    labels: DataFrame,
    model_id: int = 1,
    export_path: str | None = None,
    sink=None,
) -> DataFrame:
    """Full API-variant run; returns the export DataFrame."""
    from dataengineer_spark.plans.dx_group import run_dx_group
    from dataengineer_spark.sources.files import write_csv

    _, predictions = run_dx_group(catalog, config, source, model_id)
    export = publish_stage(predictions, labels)
    if export_path is not None:
        write_csv(export, export_path, single_file=True)
    if sink is not None:
        sink.upload(export)
    return export
