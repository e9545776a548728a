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


class TestCuration:
    def test_curate_corpus_shape_and_split(self, spark, sf_dir):
        from dataengineer_spark.plans.curation import curate_corpus
        from dataengineer_spark.testdata import load_table

        docs = load_table(spark, sf_dir, "documents")
        out = curate_corpus(docs, min_quality=0.0, langs=("en", "fr", "es", "de", "zh", "und"))
        rows = out.collect()
        # no filtering → dedup only; splits all assigned
        assert 0 < len(rows) <= docs.count()
        assert {r["split"] for r in rows} <= {"train", "valid", "test"}
        assert all(r["n_tokens"] > 0 for r in rows)

    def test_remove_near_dups_drops_higher_id(self, spark):
        from dataengineer_spark.plans.curation import remove_near_dups

        text = "the quick brown fox jumps over the lazy dog again and again today"
        df = spark.createDataFrame(
            [(1, text), (2, text), (3, "entirely different words live here now friends")],
            "doc_id long, text string",
        )
        kept = sorted(r["doc_id"] for r in remove_near_dups(df, threshold=0.9).collect())
        assert kept == [1, 3]


class TestCuration2Composition:
    def test_fold_conservation_and_trim_rule(self, spark, sf_dir):
        # same import convention as tests/test_entry.py (module is
        # cached after the first test-session import — no re-exec)
        import sys

        if "/root/repo" not in sys.path:
            sys.path.insert(0, "/root/repo")
        import __spark_entry__ as m

        rows = m.q_pipeline_curation2(spark, sf_dir).collect()
        # survivors = per-source floor(n/2); every fold in [0, 5)
        assert all(0 <= r["fold"] < 5 for r in rows)
        total_kept = sum(r["n_docs"] for r in rows)
        from dataengineer_spark.testdata import load_table
        from pyspark.sql import functions as F

        per_source = (
            load_table(spark, sf_dir, "documents")
            .groupBy("source").count().collect()
        )
        # every doc has >= 3 words in the fixtures, so no doc is dropped
        # by the novelty join and the trim keeps exactly floor(n/2)
        assert total_kept == sum(r["count"] // 2 for r in per_source)
        assert all(r["n_tokens"] > 0 for r in rows)
