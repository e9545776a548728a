"""Distributed BPE (byte-pair-encoding) vocabulary training.

The tokenizer surface (functions/truncate.py, reference capability M3/F5)
consumes a vocabulary; this trains one FROM the corpus, the way real
subword tokenizers are trained — except the corpus-scale part runs on
Spark.  The decomposition mirrors ``similarity.kmeans_codebook``:

- ONE corpus scan builds the word histogram (vocab-sized — this is the
  only data-size-dependent cost at 100 TB);
- each merge iteration computes adjacent-pair counts over the CURRENT
  segmentation of that histogram (a shuffle over vocab rows, not corpus
  rows) and collects the single best pair — a control-plane row;
- the chosen merge applies as a sentinel-delimited string replace, an
  expression both engines implement with identical left-to-right
  non-overlapping semantics, so the DuckDB oracle can replay every
  iteration bit-for-bit (unrolled CTE stages, the kmeans oracle shape).

Token boundaries are DOUBLE sentinels (``␁␁a␁␁b␁␁``) and the merge
pattern ``␁a␁␁b␁`` consumes only the inner halves: a non-overlapping
left-to-right replace then still merges back-to-back occurrences
(``x y x y`` → ``xy xy``), because each match leaves one boundary
sentinel behind for the next — with single sentinels the replace would
eat the shared boundary and skip every other pair.

Ties break deterministically: count desc, then left asc, right asc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: token separator inside a segmentation string — a control char that
#: cannot appear in whitespace-split words
SEP = "\x01"


def _segmented_histogram(df: DataFrame, text_col: str) -> DataFrame:
    """(seg, n) — each distinct word's character segmentation as a

    sentinel-delimited string (``␁c₁␁c₂␁…␁``) with its corpus count."""
    from dataengineer_spark.operators.preparation import word_counts

    words = word_counts(df.select(text_col), text_col)
    chars = F.filter(F.split(F.col("word"), ""), lambda c: c != F.lit(""))
    seg = F.concat(F.lit(SEP * 2), F.array_join(chars, SEP * 2), F.lit(SEP * 2))
    return words.select(seg.alias("seg"), F.col("n"))


def _pair_counts(hist: DataFrame) -> DataFrame:
    """Adjacent-pair counts over the current segmentation, weighted by

    word frequency.  Overlap semantics are BPE's greedy-left by
    construction: pairs are read from the CURRENT tokens, and merges are
    applied with non-overlapping left-to-right replaces."""
    tokens = F.filter(F.split(F.col("seg"), SEP), lambda t: t != F.lit(""))
    sz = F.size(tokens)
    pairs = F.zip_with(
        F.slice(tokens, 1, sz - 1),
        F.slice(tokens, 2, sz - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    return (
        hist.where(sz >= 2)
        .select(F.explode(pairs).alias("p"), "n")
        .groupBy("p.a", "p.b")
        .agg(F.sum("n").alias("cnt"))
    )


def bpe_train(
    df: DataFrame, text_col: str, n_merges: int = 8
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns them in

    order.  Iteration cost is independent of corpus size (the histogram
    is persisted once; each round shuffles vocab-sized pair rows and
    collects one row).  The merge list is fully collected before
    returning, so the histogram cache is dropped on exit — repeated
    trainings in a long-lived session leak nothing."""
    from dataengineer_spark.tuning import transient_persist

    base = transient_persist(_segmented_histogram(df, text_col))
    hist = base
    try:
        merges: list[tuple[str, str]] = []
        for _ in range(n_merges):
            best = (
                _pair_counts(hist)
                .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
                .limit(1)
                .collect()
            )
            if not best:
                break
            a, b = best[0]["a"], best[0]["b"]
            merges.append((a, b))
            hist = hist.withColumn(
                "seg",
                F.replace(
                    F.col("seg"),
                    F.lit(f"{SEP}{a}{SEP}{SEP}{b}{SEP}"),
                    F.lit(f"{SEP}{a}{b}{SEP}"),
                ),
            )
        return merges
    finally:
        base.unpersist()  # merges already collected; nothing reads the cache


def bpe_segment(col, merges: list[tuple[str, str]]):
    """Apply a learned merge list to a word column → array of subword

    tokens.  Pure expression chain (one replace per merge — vocabularies
    are training-time-bounded), so tokenization is map-only at any scale.
    """
    chars = F.filter(F.split(col, ""), lambda c: c != F.lit(""))
    seg = F.concat(F.lit(SEP * 2), F.array_join(chars, SEP * 2), F.lit(SEP * 2))
    for a, b in merges:
        seg = F.replace(
            seg,
            F.lit(f"{SEP}{a}{SEP}{SEP}{b}{SEP}"),
            F.lit(f"{SEP}{a}{b}{SEP}"),
        )
    return F.filter(F.split(seg, SEP), lambda t: t != F.lit(""))
