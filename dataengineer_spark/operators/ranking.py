"""Corpus ranking operators: TF-IDF term weighting and BM25 scoring.

The retrieval-side complement of the dedup/similarity family
(SURVEY.md §2.9 E2/E3): score documents against terms instead of other
documents. Used in training-data pipelines for quality-weighted sampling
and query-based corpus slicing.

Scale shape: tokenize is map-only (one split per document, explode keeps
rows inside their partitions); term frequencies shuffle once on
(doc, term); document frequencies aggregate the already-reduced tf rows
— at 100 TB the only wide exchange carries (doc_id, term, count) rows,
never the text. The corpus-size scalar N and avgdl are control-plane
aggregates (one number each), embedded as literals like the reference's
config lookups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataengineer_spark.operators.textops import trim_ws


def tokenize_words(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, term) rows: lowercased whitespace tokens, empties dropped."""
    t = trim_ws(F.lower(F.col(text_col)))
    return (
        df.select(id_col, F.explode(F.split(t, r"\s+")).alias("term"))
        .where(F.length("term") > 0)
    )


def tf_idf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    idf = ln((N+1)/(df+1)) + 1 (smoothed, scikit-learn convention —
    public knowledge); rank by score desc with term asc as the
    deterministic tiebreak. The returned columns are integers only
    (tf, df, rank) so the oracle compare never touches a float.
    """
    toks = tokenize_words(df, text_col, id_col)
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    # corpus size as a distributed one-row broadcast, not a .count() —
    # a driver scalar would force a second full job before the plan runs
    n_docs = df.agg(F.count("*").cast("double").alias("_n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf")
            * (F.log((F.col("_n") + 1.0) / (F.col("df") + 1)) + 1.0),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "rank")
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.5,
    b: float = 0.75,
) -> DataFrame:
    """BM25 (Robertson/Sparck Jones) document scores for a fixed term set.

    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl)),
    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)).

    Returns (id, n_hit_terms, bm25) for documents matching >= 1 term.
    The query-term tf aggregation filters BEFORE the shuffle — the
    exchange carries only rows for the |query_terms| terms.
    """
    toks = tokenize_words(df, text_col, id_col)
    # document length map-only: counting split() tokens in place avoids a
    # full explode + per-token shuffle just to count rows per doc — at
    # corpus scale that exchange carries one row per TOKEN; this one
    # carries nothing (dl rides the narrow projection until the tf join)
    t = trim_ws(F.lower(F.col(text_col)))
    dl = df.select(
        id_col,
        F.when(F.length(t) == 0, F.lit(0))
        .otherwise(F.size(F.split(t, r"\s+")))
        .cast("long")
        .alias("dl"),
    )
    # N and avgdl as distributed one-row broadcasts (no .count()/.collect()
    # — each driver scalar would run an extra full tokenize job)
    n_docs = df.agg(F.count("*").cast("double").alias("_n"))
    avgdl = dl.agg(F.avg("dl").alias("_avgdl"))
    qt = [t.lower() for t in query_terms]
    tf = (
        toks.where(F.col("term").isin(qt))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        1.0 + (F.col("_n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    per_term = (
        tf.join(F.broadcast(dfreq.crossJoin(n_docs)), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(avgdl))
        .withColumn(
            "contrib",
            idf
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("_avgdl"))
            ),
        )
    )
    # per-term contribs are doubles; the cross-term sum must not depend on
    # association order (Spark partial-agg vs the oracle's scan order), so
    # accumulate exactly in decimal and round once at the end
    return per_term.groupBy(id_col).agg(
        F.count("*").alias("n_hit_terms"),
        F.round(
            F.sum(F.col("contrib").cast("decimal(28,12)")).cast("double"), 6
        ).alias("bm25"),
    )


def rrf_fuse(
    ranked: list[tuple[DataFrame, str]],
    id_cols: list[str],
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., public method) — the

    standard way to merge rankings from heterogeneous scorers (BM25 +
    embedding retrieval, or any mix) without score calibration:
    ``rrf = Σ_r 1 / (k + rank_r)``.

    Each input is (DataFrame, rank_col) where the frame carries
    ``id_cols`` + an integer rank.  Fusion is a fan-in of outer joins on
    the id columns (items missing from a ranker contribute nothing) and
    a map-side sum — no shuffle beyond the joins, no window here; rank
    computation stays in the callers where partition-local ordering is
    known.  1/(k+rank) with integer rank is the same IEEE double on any
    engine, so the rounded fusion score is portable.
    """
    if not ranked:
        raise ValueError("rrf_fuse: no rankers given")
    out = None
    score_cols = []
    for i, (df, rank_col) in enumerate(ranked):
        side = df.select(
            *id_cols, (1.0 / (F.lit(k) + F.col(rank_col))).alias(f"_s{i}")
        )
        score_cols.append(f"_s{i}")
        out = side if out is None else out.join(side, id_cols, "full_outer")
    fused = sum(
        (F.coalesce(F.col(c), F.lit(0.0)) for c in score_cols), F.lit(0.0)
    )
    return out.select(*id_cols, F.round(fused, 6).alias("rrf_score"))


def _fair_ranked(df: DataFrame, group_col: str, order_cols: list) -> DataFrame:
    """Shared fair-trim core: per-group row_number + group size columns

    (``_ft_rn``, ``_ft_n``) — THE one definition of the ranking both the
    row filter and the report apply the integer keep rule to.

    ``order_cols`` MUST be a TOTAL order within each group (append a
    unique id as the final tiebreak): row_number over a non-unique
    ordering is partition-order dependent, and the rows that straddle
    the keep cut would flip between runs.
    """
    from pyspark.sql import Window as W

    clash = {"_ft_rn", "_ft_n"} & set(df.columns)
    if clash:
        raise ValueError(
            f"fair-trim reserves columns {sorted(clash)} — rename them "
            "on the input (withColumn would silently replace and drop "
            "the caller's data)"
        )
    w = W.partitionBy(group_col).orderBy(*order_cols)
    return df.withColumn("_ft_rn", F.row_number().over(w)).withColumn(
        "_ft_n", F.count("*").over(W.partitionBy(group_col))
    )


def _check_keep_fraction(keep_num: int, keep_den: int) -> None:
    if not (0 < keep_num <= keep_den):
        raise ValueError(
            f"need 0 < keep_num <= keep_den, got {keep_num}/{keep_den}"
        )


def fair_trim(
    df: DataFrame,
    group_col: str,
    order_cols: list,
    keep_num: int = 1,
    keep_den: int = 5,
) -> DataFrame:
    """Source-fair quality trim (E17), row-filter form: keep the top

    ``keep_num/keep_den`` of EVERY group by the given quality order —
    the fairness-preserving alternative to one global score cut, which
    silently starves sources whose score scale runs low (the classic
    mixing bug: a global threshold trained on webtext drops 95% of a
    code source). The keep rule is pure integer arithmetic
    (``rank * keep_den <= n * keep_num``): exact, engine-portable, no
    float fraction. One window shuffle on the group key.

    ``order_cols`` must be a total order per group — see
    :func:`_fair_ranked`. Returns the surviving rows, original columns.
    """
    _check_keep_fraction(keep_num, keep_den)
    ranked = _fair_ranked(df, group_col, order_cols)
    return ranked.where(
        F.col("_ft_rn") * keep_den <= F.col("_ft_n") * keep_num
    ).drop("_ft_rn", "_ft_n")


def fair_trim_report(
    df: DataFrame,
    group_col: str,
    order_cols: list,
    keep_num: int = 1,
    keep_den: int = 5,
    text_col: str | None = "text",
) -> DataFrame:
    """Accounting form of :func:`fair_trim` (same core, same keep rule):

    per-group report with exact token accounting of what the trim keeps
    vs drops — the table a trim decision is reviewed on before the row
    filter ships. One window shuffle + one aggregate. ``order_cols``
    must be a total order per group — see :func:`_fair_ranked`.

    Output: (group, n_docs, n_kept, kept_tokens, dropped_tokens)
    ordered by group.
    """
    from dataengineer_spark.operators.preparation import _ws_token_count

    _check_keep_fraction(keep_num, keep_den)
    ranked = _fair_ranked(df, group_col, order_cols).select(
        F.col(group_col).alias("_g"),
        (_ws_token_count(text_col) if text_col else F.lit(0)).alias("_t"),
        "_ft_rn",
        "_ft_n",
    )
    kept = F.col("_ft_rn") * keep_den <= F.col("_ft_n") * keep_num
    return (
        ranked.groupBy(F.col("_g").alias("grp"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(kept, F.col("_t")).otherwise(0)).alias("kept_tokens"),
            F.sum(F.when(~kept, F.col("_t")).otherwise(0)).alias(
                "dropped_tokens"
            ),
        )
        .orderBy("grp")
    )

def ndcg_discounts(k: int) -> list[float]:
    """The nDCG position discounts ``1/log2(rank+1)`` for ranks 1..k,
    computed driver-side and embedded as a PLAN LITERAL — the engine and
    any SQL oracle then share bit-identical constants instead of both
    evaluating a transcendental (log parity across libm implementations
    is not IEEE-pinned; literal doubles are).
    """
    import math

    if k <= 0:
        raise ValueError(f"ndcg_discounts: need k > 0, got {k}")
    return [1.0 / math.log2(r + 1) for r in range(1, k + 1)]


def ranking_eval(
    ranked: DataFrame,
    query_col: str,
    rank_col: str,
    rel_col: str,
    k: int = 10,
) -> DataFrame:
    """Per-query retrieval-quality metrics over a system ranking —
    nDCG@k / reciprocal rank / hit count (public formulas; the standard
    offline eval for a retrieval or reranking stage before it ships).

    Input: one row per (query, candidate) with a 1-based integer
    ``rank_col`` (the system's ordering) and an integer graded relevance
    ``rel_col`` >= 0.  Rows past rank ``k`` contribute nothing to DCG,
    hits, or RR — but they DO compete for the ideal ranking: IDCG is
    the textbook one, computed over the FULL judged candidate set (top
    ``k`` of all candidates re-ranked by relevance), so a relevant
    judged item the system buried past rank ``k`` deflates nDCG
    instead of silently inflating it (review-caught: the earlier form
    dropped rows past ``k`` before the ideal re-rank, disagreeing with
    standard nDCG whenever relevant candidates fell outside the
    system's top-k).  A NULL ``rank_col`` means judged-but-UNRETRIEVED
    (the left-join-of-judgments shape) and is the limiting case of the
    same rule: no DCG/hit/RR contribution, full IDCG participation.
    Its position among equal-relevance rows in the ideal window is
    arbitrary, which cannot change the IDCG sum (equal gains swap
    positions).

    Exactness: gains ``2^rel - 1`` are exact small integers; discounts
    come from :func:`ndcg_discounts` as plan literals, so every product
    is an IEEE-defined double on any engine and only the (rounded)
    per-query sums are float-order sensitive.  IDCG re-ranks the same
    judged set by relevance (window over the query key — the same
    hash partitioning the final aggregate uses, so the two wide stages
    share one shuffle); a permutation tie in that window cannot change
    the IDCG sum (equal gains swap positions).

    Scale shape: one shuffle on the query key (window + aggregate),
    candidate-set-sized, never corpus-sized.  Output per query:
    (query, hits, dcg, idcg, ndcg, rr), rounded to 6.
    """
    disc = F.array(*[F.lit(d) for d in ndcg_discounts(k)])
    base = ranked.select(
        F.col(query_col).alias("query"),
        F.col(rank_col).cast("int").alias("_rk"),
        F.col(rel_col).cast("int").alias("_rel"),
    )
    gain = F.pow(F.lit(2.0), F.col("_rel")) - 1.0
    w = Window.partitionBy("query").orderBy(
        F.col("_rel").desc(), F.col("_rk").asc()
    )
    in_k = F.col("_rk") <= k
    scored = base.withColumn("_irk", F.row_number().over(w)).select(
        "query",
        # CASE guards double as the element_at bound check (ANSI mode:
        # an unconditional lookup at a rank past len(disc) would raise)
        F.when(in_k, gain * F.element_at(disc, F.col("_rk")))
        .otherwise(F.lit(0.0))
        .alias("_dg"),
        F.when(
            F.col("_irk") <= k, gain * F.element_at(disc, F.col("_irk"))
        )
        .otherwise(F.lit(0.0))
        .alias("_ig"),
        F.when((F.col("_rel") > 0) & in_k, F.col("_rk")).alias("_hit_rk"),
    )
    agg = scored.groupBy("query").agg(
        F.count("_hit_rk").alias("hits"),
        F.sum("_dg").alias("_dcg"),
        F.sum("_ig").alias("_idcg"),
        F.min("_hit_rk").alias("_first_hit"),
    )
    return agg.select(
        "query",
        "hits",
        F.round("_dcg", 6).alias("dcg"),
        F.round("_idcg", 6).alias("idcg"),
        F.round(
            F.when(F.col("_idcg") > 0, F.col("_dcg") / F.col("_idcg")), 6
        ).alias("ndcg"),
        F.round(1.0 / F.col("_first_hit"), 6).alias("rr"),
    )


def rbo_weights(k: int, p: float) -> list[float]:
    """Per-item truncated-RBO weights, driver-side plan literals.

    Rank-biased overlap (Webber/Moffat/Zobel, public method) truncated
    at depth ``k`` is ``(1-p) * sum_{d=1..k} p^(d-1) * X_d / d`` with
    ``X_d`` the overlap size at depth ``d``.  Swapping the sums, each
    overlapping item contributes ``W(e) = sum_{d=e..k} p^(d-1)/d`` where
    ``e = max(rank_a, rank_b)`` is the depth it enters the overlap — so
    the whole metric becomes element_at(literal, depth) + one sum, no
    per-depth fan-out.  Returned WITHOUT the (1-p) factor (applied once
    at the end).
    """
    if k <= 0:
        raise ValueError(f"rbo_weights: need k > 0, got {k}")
    if not (0.0 < p < 1.0):
        raise ValueError(f"rbo_weights: need 0 < p < 1, got {p}")
    tail = 0.0
    out = [0.0] * k
    for d in range(k, 0, -1):
        tail += p ** (d - 1) / d
        out[d - 1] = tail
    return out


def rbo_overlap(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    query_col: str,
    id_col: str,
    rank_col: str,
    k: int = 10,
    p: float = 0.9,
) -> DataFrame:
    """Truncated rank-biased overlap between two rankings of the same
    query set — the standard top-weighted comparison of two retrieval
    configurations (old index vs new index, two ANN parameter choices)
    that, unlike plain overlap@k, cares WHERE in the lists items agree.

    Inputs carry (query, item id, 1-based rank); rows past ``k`` are
    ignored.  Per query: inner-join the two top-k lists on the item id,
    weight each shared item by its entry depth ``max(rank_a, rank_b)``
    via the :func:`rbo_weights` literal, sum, scale by (1-p).  The base
    query set is the UNION of both rankings' query sets, so the metric
    is symmetric: a query present in only one ranking keeps a row with
    rbo = 0 (review-caught — anchoring on ranking A alone silently
    dropped B-only queries, making the comparison asymmetric).
    Queries with disjoint lists likewise keep a row (rbo = 0).

    Scale shape: two rank-capped inputs equi-join on (query, id) — one
    shuffle each, candidate-set-sized; the weight lookup is map-side;
    one aggregate on the query key.  Output: (query, n_overlap, rbo).
    """
    wts = F.array(*[F.lit(x) for x in rbo_weights(k, p)])
    a = ranked_a.where(F.col(rank_col) <= k).select(
        F.col(query_col).alias("query"),
        F.col(id_col).alias("_id"),
        F.col(rank_col).cast("int").alias("_ra"),
    )
    b = ranked_b.where(F.col(rank_col) <= k).select(
        F.col(query_col).alias("query"),
        F.col(id_col).alias("_id"),
        F.col(rank_col).cast("int").alias("_rb"),
    )
    shared = a.join(b, ["query", "_id"]).select(
        "query",
        F.element_at(wts, F.greatest("_ra", "_rb")).alias("_w"),
    )
    per_q = shared.groupBy("query").agg(
        F.count("*").alias("n_overlap"),
        F.sum("_w").alias("_ws"),
    )
    base = a.select("query").union(b.select("query")).distinct()
    return base.join(per_q, "query", "left").select(
        "query",
        F.coalesce("n_overlap", F.lit(0)).cast("bigint").alias("n_overlap"),
        F.round(
            F.coalesce(F.col("_ws"), F.lit(0.0)) * (1.0 - p), 6
        ).alias("rbo"),
    )


def score_calibration(
    df: DataFrame,
    group_col: str,
    id_col: str,
    score_col: str,
) -> DataFrame:
    """Within-group percentile calibration of a quality score (public
    recipe — the other fairness fix besides :func:`fair_trim`): map each
    row's raw score to its cumulative rank share INSIDE its source, so
    scores from sources with different scales become comparable and one
    global percentile cut stops starving low-scale sources.

    ``cume_dist`` (SQL-standard: ties share the value, result =
    rows ≤ current / rows in group) is used instead of percent_rank
    over an id-tiebroken order — equal raw scores MUST calibrate
    equally or the calibration itself injects noise.  NULL scores have
    no rank and are excluded.

    Scale shape: one window shuffle on the group key; output is
    row-per-input (the calibrated column rides with the id for the
    downstream cut).  Output: (grp, id, score, calibrated) with
    calibrated rounded to 6.
    """
    base = df.where(
        F.col(score_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("id"),
        F.col(score_col).cast("double").alias("score"),
    )
    w = Window.partitionBy("grp").orderBy(F.col("score").asc())
    return base.select(
        "grp",
        "id",
        "score",
        F.round(F.cume_dist().over(w), 6).alias("calibrated"),
    )
