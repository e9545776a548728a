"""Training-data preparation + JSON + new aggregate operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataengineer_spark.functions.json_ops import json_get, json_get_long, parse_json
from dataengineer_spark.operators import aggregates as agg_ops
from dataengineer_spark.operators.preparation import (
    explode_words,
    stratified_cap,
    train_test_split,
    word_counts,
)


class TestSplit:
    def test_split_is_deterministic_and_complete(self, spark):
        df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
        a = train_test_split(df, "doc_id")
        b = train_test_split(df.repartition(7), "doc_id")  # layout-independent
        ca = {r["split"]: r["n"] for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
        cb = {r["split"]: r["n"] for r in b.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert ca == cb
        assert sum(ca.values()) == 1000
        assert ca["train"] > ca["valid"] and ca["train"] > ca["test"]

    def test_same_key_same_split(self, spark):
        df = spark.createDataFrame([(5,), (5,), (5,)], "doc_id long")
        assert train_test_split(df, "doc_id").select("split").distinct().count() == 1


class TestStratifiedAndWords:
    def test_cap_per_group(self, spark):
        df = spark.createDataFrame(
            [(i, "a" if i % 2 == 0 else "b") for i in range(20)], "id long, g string"
        )
        out = stratified_cap(df, ["g"], [F.col("id").asc()], 3)
        counts = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
        assert counts == {"a": 3, "b": 3}

    def test_word_counts(self, spark):
        df = spark.createDataFrame([("A b a",), ("b c",)], "text string")
        out = {r["word"]: r["n"] for r in word_counts(df, "text").collect()}
        assert out == {"a": 2, "b": 2, "c": 1}

    def test_explode_keeps_columns(self, spark):
        df = spark.createDataFrame([(1, "x y")], "id long, text string")
        rows = explode_words(df, "text").collect()
        assert [(r["id"], r["word"]) for r in rows] == [(1, "x"), (1, "y")]


class TestJson:
    def test_get_and_cast(self, spark):
        df = spark.createDataFrame(
            [('{"k": 87, "s": "hi"}',), ("not json",), (None,)], "props string"
        )
        rows = df.select(
            json_get("props", "s").alias("s"), json_get_long("props", "k").alias("k")
        ).collect()
        assert (rows[0]["s"], rows[0]["k"]) == ("hi", 87)
        assert rows[1]["k"] is None and rows[2]["k"] is None

    def test_parse_json_struct(self, spark):
        df = spark.createDataFrame([('{"k": 3}',)], "props string")
        out = parse_json(df, "props", "k long").select("_json.k").first()
        assert out["k"] == 3


class TestNewAggregates:
    def test_pivot_unpivot_roundtrip(self, spark):
        df = spark.createDataFrame(
            [("r", "O", 1.0), ("r", "F", 2.0), ("n", "O", 3.0)], "k string, s string, v double"
        )
        wide = agg_ops.pivot_agg(df, "k", "s", ["O", "F"], F.sum("v"))
        assert {r["k"]: (r["O"], r["F"]) for r in wide.collect()} == {
            "r": (1.0, 2.0), "n": (3.0, None),
        }
        tall = agg_ops.unpivot(wide, ["k"], ["O", "F"], "s", "v")
        assert tall.count() == 4  # includes the NULL cell

    def test_distinct_and_percentile(self, spark):
        df = spark.createDataFrame(
            [("a", 1, 10.0), ("a", 1, 20.0), ("a", 2, 30.0)], "g string, k int, v double"
        )
        d = agg_ops.distinct_agg(df, ["g"], "k", "nk").first()
        assert d["nk"] == 2
        p = agg_ops.percentiles(df, ["g"], "v", [0.5]).first()
        assert p["p50"] == 20.0
