"""Corpus scrubbing operators: PII redaction and heuristic document

filters (C4 line rules, Gopher document rules). The training-data
counterpart of the reference's clinical message cleaning
(/root/reference/dx_group.py:124-141 clean_data) generalized to web-scale
corpora (SURVEY.md §2.9 E4/E15): redact instead of strip, filter instead
of keep-all.

Everything here is native Column expressions — the hot path over a
100 TB documents table is map-only, stays inside whole-stage codegen,
and carries no shuffle. Patterns are restricted to the regex subset with
identical semantics in Java regex (Spark) and RE2 (DuckDB/the oracle):
no backreferences, no lookaround, ASCII word boundaries only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataengineer_spark.operators.textops import trim_ws

#: (kind, pattern, replacement) — applied in order. Order matters only
#: for overlapping matches (an SSN 3-2-4 is never a phone 3-3-4; a dotted
#: phone has two dots, an IPv4 needs three) but is fixed so both engines
#: see the same sequence.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
]


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_redacted",
    with_counts: bool = True,
) -> DataFrame:
    """Replace PII spans with typed placeholders; optionally append one

    ``n_<kind>`` count column per pattern (counted on the ORIGINAL text,
    so counts are independent of redaction order)."""
    c = F.col(text_col)
    red = c
    cols: dict[str, Column] = {}
    for kind, pat, repl in PII_PATTERNS:
        if with_counts:
            cols[f"n_{kind}"] = F.regexp_count(c, F.lit(pat))
        red = F.regexp_replace(red, pat, repl)
    cols[out_col] = red
    return df.withColumns(cols)


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 3,
    min_kept_lines: int = 1,
) -> DataFrame:
    """C4-style line-level cleaning: keep lines with >= ``min_words``

    whitespace words that end in terminal punctuation; drop documents with
    fewer than ``min_kept_lines`` surviving lines, any curly brace
    (code/markup tell), or 'lorem ipsum'. Appends:

    - ``text_kept``  — surviving lines re-joined with newlines;
    - ``n_lines`` / ``n_kept`` — before/after line counts;
    - ``doc_keep``   — document-level verdict.

    Array higher-order functions only: each document's line array never
    leaves its row — map-only at any corpus size.
    """
    c = F.col(text_col)
    lines = F.split(c, r"\n")
    trimmed = F.transform(lines, trim_ws)

    def line_ok(t: Column) -> Column:
        return (
            (F.length(t) > 0)
            & (F.size(F.split(t, r"\s+")) >= min_words)
            & t.rlike(r"[.!?]$")
        )

    kept = F.filter(trimmed, line_ok)
    n_kept = F.size(kept)
    doc_keep = (
        (n_kept >= min_kept_lines)
        & ~c.contains("{")
        & ~F.lower(c).contains("lorem ipsum")
    )
    return df.withColumns(
        {
            "n_lines": F.size(lines),
            "n_kept": n_kept,
            "text_kept": F.array_join(kept, "\n"),
            "doc_keep": doc_keep,
        }
    )


#: Gopher rule thresholds (Rae et al. 2021, table A1 — the widely
#: published subset that needs no tokenizer)
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MIN_ALPHA_WORD_FRAC = 0.80
GOPHER_MIN_STOP_HITS = 2

_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with", "a", "in"]


def gopher_filter(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style document-level quality rules, appended as boolean

    columns plus the conjunction ``gopher_keep``:

    - ``ok_n_words``      — 50 <= whitespace words <= 100k;
    - ``ok_word_len``     — mean word length in [3, 10];
    - ``ok_alpha_words``  — >= 80% of words contain a letter;
    - ``ok_stopwords``    — >= 2 DISTINCT stop words present (Rae et al.
      table A1 requires "2 of the stop words", not 2 occurrences — a
      gibberish doc repeating one stopword must not pass).

    One split per document, folded signals; no shuffle, no UDF.
    """
    t = trim_ws(F.col(text_col))
    words = F.split(t, r"\s+")
    n_words = F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(words))
    sum_len = F.aggregate(
        F.transform(words, lambda w: F.length(w)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    mean_word_len = F.when(n_words > 0, sum_len / n_words).otherwise(F.lit(0.0))
    n_alpha = F.size(F.filter(words, lambda w: w.rlike(r"[A-Za-z]")))
    alpha_frac = F.when(n_words > 0, n_alpha / n_words).otherwise(F.lit(0.0))
    lower_t = F.lower(F.col(text_col))
    distinct_stops = F.lit(0)
    for w in _STOPWORDS:
        distinct_stops = distinct_stops + lower_t.rlike(
            rf"\b{w}\b"
        ).cast("int")
    stop_hits = distinct_stops

    ok_n_words = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    ok_word_len = (mean_word_len >= GOPHER_MIN_MEAN_WORD_LEN) & (
        mean_word_len <= GOPHER_MAX_MEAN_WORD_LEN
    )
    ok_alpha = alpha_frac >= GOPHER_MIN_ALPHA_WORD_FRAC
    ok_stop = stop_hits >= GOPHER_MIN_STOP_HITS
    return df.withColumns(
        {
            "n_words": n_words.cast("bigint"),
            "mean_word_len_g": F.round(mean_word_len, 6),
            "ok_n_words": ok_n_words,
            "ok_word_len": ok_word_len,
            "ok_alpha_words": ok_alpha,
            "ok_stopwords": ok_stop,
            "gopher_keep": ok_n_words & ok_word_len & ok_alpha & ok_stop,
        }
    )


def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """Corpus-frequency line deduplication — boilerplate removal (public
    method: the CCNet/RefinedWeb line-dedup step): a line that appears in
    at least ``min_docs`` DISTINCT documents is boilerplate (navigation,
    footers, cookie banners, templating) and is dropped from EVERY
    document; document-rare lines survive in their original order.  The
    per-document complement is :func:`c4_line_filter` (local rules); this
    operator needs the corpus — no per-doc rule can know a line is
    corpus-wide template text.

    Blank lines are normalized away up front (a corpus-frequency rule on
    the empty string would delete every doc's blank separators or none,
    adding nothing but threshold noise).

    Scale shape: ONE posexplode pass (transient-persisted — it feeds
    both the count and the anti join; blocks free when the returned
    frame is garbage-collected, no caller cleanup obligation), one
    line-keyed exchange for the distinct-doc count
    (count_distinct partials map-side; at 100 TB swap the key for
    ``xxhash64(line)`` — same plan, 8-byte keys; the string key is kept
    here so the SQL oracle replays verbatim), a left-anti join of the
    line rows against the boilerplate set (frequency-thresholded —
    template lines are few, so the build side broadcasts), one shuffle
    on the id to reassemble, plus a narrow map-only totals scan that
    keeps zero-line documents as rows.  Documents whose every line was
    boilerplate come back with an empty string, not a dropped row —
    silent row loss is how boilerplate removal corrupts joins downstream.

    Output: ``(id, text_clean, n_lines, n_kept)``; ``n_lines`` counts the
    non-blank lines in.
    """
    import re

    from dataengineer_spark.tuning import tie_lifetime, transient_persist

    # split must treat sep as the LITERAL the reassembly concat_ws uses —
    # F.split takes a regex, so metachar separators ('|', '.') would
    # shred the text into characters without the escape
    sep_re = re.escape(sep)
    # feeds the count AND the anti join: one explode pass, corpus-sized →
    # serialized blocks, unpersisted on result-frame GC (tie_lifetime)
    lines = transient_persist(df.select(
        F.col(id_col),
        F.posexplode(
            F.filter(
                F.split(F.coalesce(F.col(text_col), F.lit("")), sep_re),
                lambda x: x != F.lit(""),
            )
        ).alias("pos", "line"),
    ))
    boiler = (
        lines.groupBy("line")
        # distinct-doc count in ONE line-keyed exchange (count_distinct
        # partials map-side) instead of a (id, line) dedup shuffle first
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("line")
    )
    kept = lines.join(boiler, "line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s.getField("line"),
            ),
        ).alias("text_clean"),
        F.count("*").alias("n_kept"),
    )
    totals = df.select(
        F.col(id_col),
        F.size(
            F.filter(
                F.split(F.coalesce(F.col(text_col), F.lit("")), sep_re),
                lambda x: x != F.lit(""),
            )
        ).cast("bigint").alias("n_lines"),
    )
    out = totals.join(rebuilt, id_col, "left_outer").select(
        id_col,
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        "n_lines",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
    )
    return tie_lifetime(out, lines)
