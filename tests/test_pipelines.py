"""End-to-end pipeline tests (SURVEY.md §3): DX-Group, API variant,

prostate fan-out/fan-in — on tiny sources and a tmp lake."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataengineer_spark.catalog import Catalog
from dataengineer_spark.config import RunConfig
from dataengineer_spark.plans.api_variant import publish_stage, run_dx_group_api
from dataengineer_spark.plans.dx_group import clean_stage, prep_stage, run_dx_group
from dataengineer_spark.plans.prostate import run_prostate
from dataengineer_spark.schemas import API_EXPORT_COLUMNS, PROSTATE_PRED_FIELDS


@pytest.fixture
def source(spark):
    rows = [
        (1, "GROSS: big mass\nDIAGNOSIS: carcinoma"),
        (2, "plain report text with nothing special"),
        (3, None),
    ]
    return spark.createDataFrame(rows, "msgid long, message string")


PATTERNS = {"gross": r"GROSS:([^\n]*)", "diagnosis": r"DIAGNOSIS:([^\n]*)"}


class TestDxGroup:
    def test_lazy_run_shape(self, spark, tmp_path, source):
        catalog = Catalog(spark, str(tmp_path / "lake"))
        ctx, preds = run_dx_group(
            catalog, RunConfig(), source, patterns=PATTERNS, persist=False
        )
        assert ctx.batch_id == 1
        rows = preds.orderBy("msgid").collect()
        assert [r["batch_id"] for r in rows] == [1, 1, 1]
        assert preds.columns == [
            "batch_id", "msgid", "predicted_label", "model_score", "model_id",
        ]

    def test_persisted_run_writes_contract_tables(self, spark, tmp_path, source):
        catalog = Catalog(spark, str(tmp_path / "lake"))
        ctx, _ = run_dx_group(catalog, RunConfig(), source, patterns=PATTERNS)
        for table in ["cleaned_data", "preped_data", "prediction_table"]:
            assert catalog.read_batch(table, ctx.batch_id).count() == 3
        # second run gets batch 2 and leaves batch 1 intact
        ctx2, _ = run_dx_group(catalog, RunConfig(), source, patterns=PATTERNS)
        assert ctx2.batch_id == 2
        assert catalog.read("prediction_table").count() == 6

    def test_null_text_survives(self, spark, tmp_path, source):
        catalog = Catalog(spark, str(tmp_path / "lake"))
        _, preds = run_dx_group(
            catalog, RunConfig(), source, patterns=PATTERNS, persist=False
        )
        row = preds.where(F.col("msgid") == 3).first()
        assert row is not None  # empty/null report must not kill the run


class TestApiVariant:
    def test_export_schema_and_inner_join_drop(self, spark, tmp_path, source):
        catalog = Catalog(spark, str(tmp_path / "lake"))
        _, preds = run_dx_group(
            catalog, RunConfig(), source, patterns=PATTERNS, persist=False
        )
        # dim covering only some labels → inner join drops the rest
        labels = spark.createDataFrame(
            [(1, k, f"N{k}") for k in range(8)],
            "model_id long, label long, label_name string",
        )
        export = publish_stage(preds, labels)
        assert export.columns == API_EXPORT_COLUMNS
        kept = export.count()
        assert 0 <= kept <= 3

    def test_full_api_run_writes_csv(self, spark, tmp_path, source):
        catalog = Catalog(spark, str(tmp_path / "lake"))
        labels = spark.createDataFrame(
            [(1, k, f"N{k}") for k in range(16)],
            "model_id long, label long, label_name string",
        )
        out_path = str(tmp_path / "export_csv")
        export = run_dx_group_api(
            catalog, RunConfig(), source, labels, export_path=out_path
        )
        assert export.columns == API_EXPORT_COLUMNS
        back = spark.read.option("header", True).csv(out_path)
        assert back.count() == export.count()


class TestProstate:
    def test_output_schema_and_constants(self, spark, source):
        cleaned = clean_stage(source, batch_id=1)
        segments = prep_stage(cleaned, PATTERNS)
        out = run_prostate(segments)
        expected = ["msg_id"] + [
            c for f in PROSTATE_PRED_FIELDS for c in (f, f"{f}_pred_score")
        ]
        assert out.columns == expected
        row = out.orderBy("msg_id").first()
        assert row["site_code"] == "C61.9"
        assert row["behaviour_code"] == "3"
        assert row["laterality"] == "00"
        assert row["site_code_pred_score"] == 1.0
        assert out.count() == 3
