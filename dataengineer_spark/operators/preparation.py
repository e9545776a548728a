"""Training-data preparation operators (SURVEY.md §2.9 extension surface).

The idioms a 100 TB corpus pipeline actually needs for dataset assembly:
deterministic hash-based splits (reproducible regardless of partitioning —
never ``sample()`` for split assignment, its result depends on partition
layout), stratified caps per group, and word/token explosion for frequency
analysis. All JVM-side expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPLIT_MULT = 2654435761  # Knuth multiplicative-hash constant


def hash_bucket(key: Column, buckets: int = 100, salt: int = 0) -> Column:
    """Deterministic bucket in [0, buckets) from a numeric key — stable

    across runs, partitionings, and engines (plain integer arithmetic)."""
    return F.pmod(key * SPLIT_MULT + salt, F.lit(buckets))


def train_test_split(
    df: DataFrame,
    key_col: str,
    train_pct: int = 80,
    valid_pct: int = 10,
    out_col: str = "split",
    salt: int = 0,
) -> DataFrame:
    """Assign train/valid/test by hash bucket of a stable key.

    Key-based (not row-based) so all rows of one document/user land in the
    same split — the leakage-safe default for dedup-sensitive corpora.
    """
    b = hash_bucket(F.col(key_col), 100, salt)
    split = (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + valid_pct, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn(out_col, split)


def stratified_cap(
    df: DataFrame, group_cols: list[str], order_by: list[Column], cap: int
) -> DataFrame:
    """At most ``cap`` rows per group, deterministically chosen by

    ``order_by`` — the per-source/per-language quota pattern for corpus
    balancing (window row_number, one shuffle on the group keys)."""
    from dataengineer_spark.operators.windows import top_k_per_group

    return top_k_per_group(df, group_cols, order_by, cap)


def sample_n_per_group(
    df: DataFrame, group_cols: list[str], id_col: str, n: int, salt: str = ""
) -> DataFrame:
    """Deterministic pseudo-random sample of ``n`` rows per group: rank by
    the md5 of (id, salt) and keep the first ``n``. Unlike ``df.sample``
    this is exactly reproducible across runs/engines and exactly ``n`` per
    group (when the group has that many) — the eval-set carving pattern.
    Changing ``salt`` redraws the sample. One shuffle on the group keys.
    """
    from dataengineer_spark.operators.windows import top_k_per_group

    order = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    return top_k_per_group(df, group_cols, [order.asc(), F.col(id_col).asc()], n)


def explode_words(
    df: DataFrame, text_col: str, out_col: str = "word", lowercase: bool = True
) -> DataFrame:
    """One row per whitespace token (keeps all other columns)."""
    from dataengineer_spark.operators.textops import trim_ws

    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    return df.withColumn(out_col, F.explode(F.split(trim_ws(c), r"\s+")))


def word_counts(
    df: DataFrame, text_col: str, top_n: int | None = None
) -> DataFrame:
    """Corpus word-frequency table (map-side combine then one shuffle);

    deterministic order by (count desc, word) when ``top_n`` is set."""
    words = explode_words(df.select(text_col), text_col)
    counts = words.groupBy("word").agg(F.count("*").alias("n"))
    if top_n is not None:
        counts = counts.orderBy(F.col("n").desc(), F.col("word").asc()).limit(top_n)
    return counts
