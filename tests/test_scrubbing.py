"""Scrubbing (PII redaction, C4/Gopher filters), ranking (TF-IDF/BM25),

and semantic-dedup operator tests on crafted rows — the oracle gate
covers the same operators against DuckDB on the synthetic corpus; these
pin the semantics on adversarial inputs the corpus doesn't contain.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dataengineer_spark.operators import ranking, scrubbing
from dataengineer_spark.operators.similarity import semantic_dedup


def test_redact_pii_all_kinds(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-ample.org now"),
            (2, "ssn 123-45-6789 phone 604-555-1234 ip 192.168.0.1"),
            (3, "dotted phone 604.555.1234"),
            (4, "nothing to see"),
            (5, "two mails x@y.io and z@w.co end"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in scrubbing.redact_pii(df).collect()
    }
    assert out[1]["text_redacted"] == "mail [EMAIL] now"
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 0
    assert out[2]["text_redacted"] == "ssn [SSN] phone [PHONE] ip [IP]"
    assert (out[2]["n_ssn"], out[2]["n_phone"], out[2]["n_ipv4"]) == (1, 1, 1)
    assert out[3]["text_redacted"] == "dotted phone [PHONE]"
    assert out[4]["text_redacted"] == "nothing to see"
    assert sum(out[4][f"n_{k}"] for k, _, _ in scrubbing.PII_PATTERNS) == 0
    assert out[5]["n_email"] == 2
    assert out[5]["text_redacted"] == "two mails [EMAIL] and [EMAIL] end"


def test_c4_line_filter(spark):
    doc = "Keep this proper sentence.\nno punct line\nshort.\n\nAnother good line here!"
    df = spark.createDataFrame(
        [(1, doc), (2, "code { x }"), (3, "Lorem Ipsum dolor sit amet.")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in scrubbing.c4_line_filter(df).collect()}
    assert out[1]["n_lines"] == 5
    assert out[1]["n_kept"] == 2
    assert out[1]["text_kept"] == (
        "Keep this proper sentence.\nAnother good line here!"
    )
    assert out[1]["doc_keep"] is True
    assert out[2]["doc_keep"] is False  # curly brace
    assert out[3]["doc_keep"] is False  # lorem ipsum (and case-folded)


def test_gopher_filter_rules(spark):
    good = "the quick brown fox " * 20  # 80 words, all alpha, stopwords
    short = "too short to pass."
    no_stop = "zzz qqq " * 40
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, no_stop), (4, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in scrubbing.gopher_filter(df).collect()}
    assert out[1]["gopher_keep"] is True
    assert out[2]["ok_n_words"] is False
    assert out[3]["ok_stopwords"] is False
    assert out[4]["n_words"] == 0 and out[4]["gopher_keep"] is False


def test_tf_idf_top_terms_manual(spark):
    df = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "apple cherry"), (3, "banana banana date")],
        "doc_id long, text string",
    )
    rows = ranking.tf_idf_top_terms(df, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: apple tf=2 df=2, banana tf=1 df=2 -> apple first
    d1 = sorted(by_doc[1], key=lambda r: r["rank"])
    assert [r["term"] for r in d1] == ["apple", "banana"]
    assert d1[0]["tf"] == 2 and d1[0]["df"] == 2
    # doc 2: cherry (df=1) outranks apple (df=2) at equal tf=1
    d2 = sorted(by_doc[2], key=lambda r: r["rank"])
    assert [r["term"] for r in d2] == ["cherry", "apple"]


def test_bm25_scores_manual(spark):
    df = spark.createDataFrame(
        [(1, "table table chair"), (2, "table lamp"), (3, "sofa lamp rug")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ranking.bm25_scores(df, ["table"]).collect()}
    assert set(out) == {1, 2}  # doc 3 has no query term
    assert out[1]["n_hit_terms"] == 1
    # manual: N=3, df=2, idf=ln(1+(3-2+0.5)/(2+0.5)); dl=3,2; avgdl=8/3
    idf = math.log(1 + 1.5 / 2.5)
    k1, b = 1.5, 0.75
    avgdl = 8 / 3

    def s(tf, dl):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert abs(out[1]["bm25"] - round(s(2, 3), 6)) < 1e-6
    assert abs(out[2]["bm25"] - round(s(1, 2), 6)) < 1e-6
    assert out[1]["bm25"] > out[2]["bm25"]  # higher tf wins here


def test_semantic_dedup_min_id_survivor(spark):
    # three copies of one direction + one orthogonal vector; any reasonable
    # codebook puts identical vectors in the same cell
    v = [1.0, 0.0, 0.0, 0.0]
    w = [0.0, 1.0, 0.0, 0.0]
    df = spark.createDataFrame(
        [(10, v), (20, v), (30, v), (40, w)],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["id"]: r
        for r in semantic_dedup(df, dim=4, threshold=0.99, n_centroids=4).collect()
    }
    assert out[10]["dropped"] is False and out[10]["kept_by"] is None
    assert out[20]["dropped"] is True and out[20]["kept_by"] == 10
    assert out[30]["dropped"] is True and out[30]["kept_by"] == 10
    assert out[40]["dropped"] is False


def test_semantic_dedup_deterministic(spark, sf_dir):
    from dataengineer_spark.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted(
        semantic_dedup(emb, dim=64, threshold=0.9, n_centroids=8).collect()
    )
    b = sorted(
        semantic_dedup(emb, dim=64, threshold=0.9, n_centroids=8).collect()
    )
    assert a == b
