"""Joins & lookups (J1–J4) + join completions (E9).

The reference's only real join was fact × tiny label dim via ``pd.merge``
(reference diagnostic_group_pipeline_with_api.py:306-312); at scale that is
a broadcast hash join — no shuffle of the fact side. The fan-in merge of
the prostate DAG's parallel branches (prostate_dag.py:180-204) becomes a
keyed multi-join. Semi/anti/range/as-of joins are engine extensions
(SURVEY.md §2.9 E9).
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame, Row
from pyspark.sql import functions as F

from dataengineer_spark.tuning import lineage_cut


def label_join(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str = "predicted_label",
    dim_key: str = "label",
    how: str = "inner",
    dim_key_nonnull: bool = False,
) -> DataFrame:
    """J1 — enrich predictions with the label dimension.

    The dim side is broadcast: at 100 TB of facts the join stays
    shuffle-free (the reference achieved the same effect by holding the
    whole labels table in one process's memory).

    ``dim_key_nonnull=True`` (safe for engine-managed dims whose key has
    no nulls) switches the equality to null-safe ``<=>``. Result is
    identical, but Catalyst then infers no ``isnotnull(fact_key)`` filter
    — which matters when the fact key is an expensive computed expression
    (the stand-in classifier chain): the inferred filter would inline and
    re-evaluate the whole expression tree a second time per row.
    """
    cond = (
        facts[fact_key].eqNullSafe(dim[dim_key])
        if dim_key_nonnull
        else facts[fact_key] == dim[dim_key]
    )
    return facts.join(F.broadcast(dim), cond, how)


def point_lookup(df: DataFrame, **equalities) -> Row | None:
    """J2 — scalar config lookup (``model_info.iloc[0]``, reference

    dx_group.py:174-175). Filter then ``first()``: only one row ever reaches
    the driver. For config-sized tables only — never bulk data.
    """
    out = df
    for name, value in equalities.items():
        out = out.where(F.col(name) == value)
    return out.first()


def fanin_merge(
    branches: list[DataFrame], on: str = "msg_id", how: str = "outer"
) -> DataFrame:
    """J4 — merge N parallel branch outputs on a key (reference

    prostate_dag.py:180-204, body stubbed there; intent from DAG edges).
    Branch outputs are per-message prediction columns, so the merged width
    grows but row count stays bounded by the message set.
    """
    if not branches:
        raise ValueError("fanin_merge: no branches")
    return functools.reduce(lambda a, b: a.join(b, on=on, how=how), branches)


# -- E9: join completions ---------------------------------------------------


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS — rows of ``left`` with a match in ``right``."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS — rows of ``left`` without a match in ``right``."""
    return left.join(right, on=on, how="left_anti")


def range_join(left: DataFrame, right: DataFrame, condition: Column) -> DataFrame:
    """Theta/range join. Include an equality conjunct in ``condition``

    whenever one exists — Catalyst extracts equi-predicates from a compound
    condition and plans a hash join with the range part as a post-filter; a
    pure range condition is a broadcast nested-loop join, acceptable only
    when one side is dimension-sized.
    """
    return left.join(right, condition)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance: str | float | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with

    ``right_ts <= left_ts`` (direction='backward'; 'forward' = earliest
    right row at/after), within the same ``on`` key group.  With
    ``tolerance`` (an interval literal like ``"1 hour"`` for timestamp
    keys, or a number for numeric ones), a match
    farther than the tolerance from the left timestamp is nulled out —
    pandas ``merge_asof(tolerance=...)`` semantics, applied as a
    post-fill mask so the plan shape (one shuffle, one window) does not
    change.

    Implemented as union + window (single shuffle on ``on``), not a
    per-key ``merge_asof`` in Python: scales with the shuffle, stays
    JVM-side.  The matched right row is carried ATOMICALLY as one struct
    (ts + payload) filled with last/first(ignorenulls) over the
    interleaved, time-ordered union — so a NULL in one payload column of
    the nearest right row stays NULL rather than leaking an older row's
    value, and the tolerance mask and the payload values always come
    from the same row (pandas ``merge_asof`` row-level semantics).
    """
    from pyspark.sql import Window as W
    from pyspark.sql.types import StructField, StructType

    r_payload = [c for c in right.columns if c not in (on, right_ts)]
    l_payload = [c for c in left.columns if c not in (on, left_ts)]
    clash = set(l_payload) & set(r_payload)
    if clash:
        raise ValueError(f"asof_join: rename clashing payload columns {sorted(clash)}")

    rrow_type = StructType(
        [StructField("_rts", right.schema[right_ts].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in r_payload]
    )
    tagged_l = left.select(
        F.col(on),
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in l_payload],
        F.lit(None).cast(rrow_type).alias("_rrow"),
    )
    tagged_r = right.select(
        F.col(on),
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_payload],
        F.struct(
            F.col(right_ts).alias("_rts"), *[F.col(c) for c in r_payload]
        ).alias("_rrow"),
    )
    unioned = tagged_l.unionByName(tagged_r)

    if direction == "backward":
        # right rows sort before left rows at equal ts → a right row at the
        # same timestamp is visible to the left row
        w = (
            W.partitionBy(on)
            .orderBy(F.col("_asof_ts").asc(), F.col("_is_left").asc())
            .rowsBetween(W.unboundedPreceding, 0)
        )
        filled_row = F.last(F.col("_rrow"), ignorenulls=True).over(w)
    elif direction == "forward":
        w = (
            W.partitionBy(on)
            .orderBy(F.col("_asof_ts").asc(), F.col("_is_left").desc())
            .rowsBetween(0, W.unboundedFollowing)
        )
        filled_row = F.first(F.col("_rrow"), ignorenulls=True).over(w)
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    out = (
        unioned.select(
            F.col(on),
            F.col("_asof_ts"),
            F.col("_is_left"),
            *[F.col(c) for c in l_payload],
            filled_row.alias("_rrow_m"),
        )
        .where(F.col("_is_left") == 1)
        .drop("_is_left")
    )
    rts_m = F.col("_rrow_m").getField("_rts")
    keep = rts_m.isNotNull()
    if tolerance is not None:
        try:  # numeric ts columns take a plain numeric gap
            iv = F.lit(float(tolerance))
        except (TypeError, ValueError):
            iv = F.expr(f"INTERVAL {tolerance}")
        if direction == "backward":
            keep = keep & (rts_m >= F.col("_asof_ts") - iv)
        else:
            keep = keep & (rts_m <= F.col("_asof_ts") + iv)
    return out.select(
        F.col(on),
        F.col("_asof_ts").alias(left_ts),
        *[F.col(c) for c in l_payload],
        *[F.when(keep, F.col("_rrow_m").getField(c)).otherwise(F.lit(None)).alias(c)
          for c in r_payload],
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    n_salt: int = 16,
) -> DataFrame:
    """Hot-key-proof equi-join: the (skewed) left side salts each row into

    one of ``n_salt`` sub-keys — round-robin within each task via
    ``monotonically_increasing_id``, so a hot key's rows spread across
    salts EVEN when they are exact duplicates (a whole-row hash would
    send identical copies to one salt and the mitigation would silently
    do nothing) — and the right side replicates each row ``n_salt``
    times; the join runs on (key, salt).  The hot key's work lands on
    ``n_salt`` tasks instead of one.  Result is row-identical to the
    plain inner join (any salt value joins correctly — the assignment
    need not be reproducible across runs, only uniform).

    When to use: AQE's skew-join split (pinned in tests/test_plans.py)
    already handles sort-merge skew at runtime, but it can only split a
    partition, not a single key's sort group in every topology — explicit
    salting is the deterministic fallback, and the standard tool when the
    right side is too big to broadcast yet small next to the fact
    (replication costs n_salt × |right| shuffle volume).
    """
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salt))
    l = left.withColumn("_salt", salt)
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    out = l.join(
        r,
        # qualified refs: unqualified F.col would be ambiguous whenever
        # the join key carries the same name on both sides
        (l[left_on] == r[right_on]) & (l["_salt"] == r["_salt"]),
    )
    return out.drop("_salt")


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_text: str,
    right_text: str,
    block_on: list[tuple[Column, Column]],
    max_distance: int = 5,
    prefix_len: int = 40,
    self_join: bool = True,
) -> DataFrame:
    """Blocked fuzzy (edit-distance) join — the entity-resolution

    workhorse: candidate pairs come ONLY from equality on the blocking
    keys (an ordinary shuffled equi-join, never a cross product), then
    each candidate is verified with ``levenshtein`` on a bounded text
    prefix.  Cost is Σ |block|² over blocks, so blocking-key design, not
    data volume, bounds the work — the standard ER trade of recall
    (pairs split across blocks are missed) for a scalable plan.

    ``prefix_len`` caps the O(n·m) edit-distance verify per pair;
    Spark's ``levenshtein`` and ANSI SQL's agree on semantics, so the
    pair set is engine-portable.  Output: (id_a, id_b, lev_dist).

    ``self_join=True`` (the ER dedup default) keeps only id_a < id_b so
    each unordered pair appears once and a row never matches itself.
    Pass ``self_join=False`` when left and right are genuinely
    different tables: every blocked (id_a, id_b) combination is then
    kept regardless of id ordering (ids may even collide across
    tables — they are different key spaces).
    """
    l = left.select(
        F.col(left_id).alias("_ida"),
        F.substring(F.col(left_text), 1, prefix_len).alias("_ta"),
        *[expr.alias(f"_bk{i}") for i, (expr, _) in enumerate(block_on)],
    )
    r = right.select(
        F.col(right_id).alias("_idb"),
        F.substring(F.col(right_text), 1, prefix_len).alias("_tb"),
        *[expr.alias(f"_bk{i}") for i, (_, expr) in enumerate(block_on)],
    )
    keys = [f"_bk{i}" for i in range(len(block_on))]
    pairs = l.join(r, keys)
    if self_join:
        pairs = pairs.where(F.col("_ida") < F.col("_idb"))
    return (
        pairs.withColumn("lev_dist", F.levenshtein("_ta", "_tb"))
        .where(F.col("lev_dist") <= max_distance)
        .select(
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            "lev_dist",
        )
    )


def fuzzy_join_topk(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_text: str,
    right_text: str,
    block_on: list[tuple[Column, Column]],
    k: int = 3,
    max_distance: int = 5,
    prefix_len: int = 40,
    self_join: bool = True,
) -> DataFrame:
    """Output-bounded fuzzy join: each left entity keeps only its ``k``

    best matches.  The unbounded ``fuzzy_join`` emits EVERY verified
    pair — on clone-heavy corpora the round-7 sf1 probe measured the
    match set exploding ×6,718 while inputs grew ×10 (SCALE.md), so the
    capped form is what a real ER user runs first: review queues and
    merge candidates want "the few best per record", not the cross
    product of a hot block.

    The cap is the engine's standard rank-window pattern applied AFTER
    blocking + verify: partition by the left id over the verified match
    set (already Σ|block|²-bounded), order by (distance, right id) for a
    deterministic engine-portable tie-break, keep ``row_number ≤ k``.
    The window shuffles only verified matches — output is ≤ k rows per
    left entity no matter how hot a block gets, and the window key (the
    left id) is exactly the entity key, so skew is bounded by the
    per-entity match count the verify already paid for.

    Output: (id_a, id_b, lev_dist, match_rank) with match_rank 1-based.
    """
    from pyspark.sql import Window

    m = fuzzy_join(
        left, right, left_id, right_id, left_text, right_text,
        block_on, max_distance=max_distance, prefix_len=prefix_len,
        self_join=self_join,
    )
    w = Window.partitionBy("id_a").orderBy(
        F.col("lev_dist").asc(), F.col("id_b").asc()
    )
    return m.withColumn("match_rank", F.row_number().over(w)).where(
        F.col("match_rank") <= k
    )


def linkage_score(
    pairs: DataFrame,
    agreements: list[tuple[Column, float, float]],
    threshold: float = 0.0,
) -> DataFrame:
    """Fellegi–Sunter probabilistic record-linkage scoring (public

    method) over candidate pairs (produced by ``fuzzy_join`` or any
    blocking stage): each field contributes ``log2(m/u)`` when it
    agrees and ``log2((1-m)/(1-u))`` when it doesn't, with (m, u) the
    match/non-match agreement probabilities.  The weights are Python-
    side constants, so the per-row work is a CASE chain over fixed
    double literals — map-only, exact, and trivially SQL-replicable.

    ``agreements`` is [(agree_predicate, m, u), …].  Adds
    ``link_score`` (rounded 6) and ``is_match`` (score ≥ threshold).
    A predicate evaluating to NULL (a MISSING field value) contributes
    0 — the Fellegi–Sunter missing-data convention: absence of evidence
    is not disagreement, and charging w_d would bury incomplete records
    below threshold.
    """
    import math

    score = F.lit(0.0)
    for pred, m, u in agreements:
        w_a = math.log2(m / u)
        w_d = math.log2((1.0 - m) / (1.0 - u))
        score = score + (
            F.when(pred, F.lit(w_a))
            .when(~pred, F.lit(w_d))
            .otherwise(F.lit(0.0))
        )
    return pairs.withColumn("link_score", F.round(score, 6)).withColumn(
        "is_match", F.round(score, 6) >= threshold
    )


def interval_overlap_join(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    id_col: str,
    bucket_seconds: int,
) -> DataFrame:
    """E9 interval×interval overlap self-join — the range-RANGE shape

    Spark has no native join for (point-in-range is q_e9_range_join;
    this finds PAIRS of overlapping intervals per key: double-booking,
    concurrent-session, overlapping-span detection). Scale plan is the
    standard temporal-bucket decomposition: each interval explodes to
    the ``bucket_seconds``-wide buckets it covers, the join is a plain
    (key, bucket) equi-join — shuffle keyed and bounded, never
    key×key² — and each true pair is emitted EXACTLY ONCE, in the
    bucket containing max(start_a, start_b) (no distinct pass; that
    bucket is shared by construction whenever the intervals overlap).
    Pick ``bucket_seconds`` ≈ the max interval span: explode factor
    stays ≤ 2 and candidate pressure per bucket is minimal.

    Intervals are epoch-second longs, end inclusive and required
    non-NULL with end >= start — the first violating row aborts the run
    with a named id (a negative or NULL span would otherwise silently
    vanish from every bucket). Touching endpoints count as overlap_s=0.

    Output: (key, id_a, id_b, overlap_s) with id_a < id_b.
    """
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be positive, got {bucket_seconds}")
    w = F.lit(int(bucket_seconds)).cast("long")
    s, e = F.col(start_col).cast("long"), F.col(end_col).cast("long")
    checked_e = F.when(s.isNotNull() & e.isNotNull() & (e >= s), e).otherwise(
        F.raise_error(
            F.format_string(
                "invalid interval (NULL bound or end < start) for %s",
                F.col(id_col),
            )
        )
    )
    iv = df.select(
        F.col(key_col).alias("_k"),
        F.col(id_col).alias("_id"),
        s.alias("_s"),
        checked_e.alias("_e"),
    )
    exploded = iv.select(
        "*",
        F.explode(
            F.sequence(F.floor(F.col("_s") / w), F.floor(F.col("_e") / w))
        ).alias("_b"),
    )
    a = exploded.select(
        F.col("_k"), F.col("_b"),
        F.col("_id").alias("id_a"), F.col("_s").alias("_sa"), F.col("_e").alias("_ea"),
    )
    b = exploded.select(
        F.col("_k"), F.col("_b"),
        F.col("_id").alias("id_b"), F.col("_s").alias("_sb"), F.col("_e").alias("_eb"),
    )
    pairs = a.join(b, ["_k", "_b"]).where(
        (F.col("id_a") < F.col("id_b"))
        & (F.col("_sa") <= F.col("_eb"))
        & (F.col("_sb") <= F.col("_ea"))
        # emit-once rule: only the bucket holding max(start_a, start_b)
        & (F.col("_b") == F.floor(F.greatest(F.col("_sa"), F.col("_sb")) / w))
    )
    return pairs.select(
        F.col("_k").alias(key_col),
        "id_a",
        "id_b",
        (
            F.least(F.col("_ea"), F.col("_eb"))
            - F.greatest(F.col("_sa"), F.col("_sb"))
        ).alias("overlap_s"),
    )


def blocking_quality(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_expr: Column,
    max_distance: int = 5,
    prefix_len: int = 40,
    allow_quadratic: bool = False,
) -> DataFrame:
    """Blocking-scheme quality audit for entity resolution — the two

    numbers a blocking design is judged by (Christen 2012): REDUCTION
    RATIO (how much of the n² pair space the blocks prune) and PAIR
    COMPLETENESS (what fraction of true matches survive the pruning —
    :func:`fuzzy_join`'s documented recall trade, measured instead of
    guessed). Ground truth is the exact prefix-Levenshtein pair set on a
    bounded sample (guarded quadratic — audit a sample, never the
    corpus, exactly like the ANN/near-dup recall audits); the candidate
    set is the block equi-join the production fuzzy join would run.
    All counts exact int64; the two ratios are single IEEE divisions.

    Output: one row (n_rows, n_pairs_total, n_cand, n_true, n_found,
    reduction_ratio, completeness); completeness is NULL when the
    sample has no true matches.
    """
    from dataengineer_spark.operators.similarity import _guard_quadratic

    _guard_quadratic(
        df, "audit sample", "a bounded (e.g. literal-filtered) audit sample",
        allow_quadratic,
    )
    t = df.select(
        F.col(id_col).alias("_id"),
        F.substring(F.col(text_col), 1, prefix_len).alias("_p"),
        block_expr.alias("_bk"),
    )
    a = t.select(
        F.col("_id").alias("id_a"), F.col("_p").alias("_pa"),
        F.col("_bk").alias("_ba"),
    )
    b = t.select(
        F.col("_id").alias("id_b"), F.col("_p").alias("_pb"),
        F.col("_bk").alias("_bb"),
    )
    truth = (
        a.crossJoin(b)
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.levenshtein("_pa", "_pb") <= max_distance)
        )
        .select("id_a", "id_b", F.col("_ba") == F.col("_bb"))
        .toDF("id_a", "id_b", "_blocked")
    )
    truth_stats = truth.agg(
        F.count("*").alias("n_true"),
        F.coalesce(
            F.sum(F.when(F.col("_blocked"), 1).otherwise(0)),
            F.lit(0).cast("long"),
        ).alias("n_found"),
    )
    cand_stats = (
        a.join(b, F.col("_ba") == F.col("_bb"))
        .where(F.col("id_a") < F.col("id_b"))
        .agg(F.count("*").alias("n_cand"))
    )
    base_stats = df.agg(F.count("*").alias("n_rows"))
    joined = (
        base_stats.crossJoin(F.broadcast(cand_stats))
        .crossJoin(F.broadcast(truth_stats))
    )
    n = F.col("n_rows")
    total = (n * (n - 1) / F.lit(2)).cast("long")
    return joined.select(
        "n_rows",
        total.alias("n_pairs_total"),
        "n_cand",
        "n_true",
        "n_found",
        F.round(
            F.when(total > 0, 1 - F.col("n_cand") / total), 6
        ).alias("reduction_ratio"),
        F.when(
            F.col("n_true") > 0, F.col("n_found") / F.col("n_true")
        ).alias("completeness"),
    )


def interval_coverage(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    id_col: str,
) -> DataFrame:
    """Merged-interval coverage per key (the UNION-length question:

    total busy seconds, device uptime, session-covered time — where
    summing raw durations double-counts every overlap). Classic sweep
    without a sweep: one window per key ordered by (start, end, id)
    carries the running max end; an interval starting STRICTLY after
    that max opens a new island (half-open [s, e) semantics — touching
    intervals merge), the island id is a running sum, and each island's
    union length is exactly max(end) - min(start) because islands are
    contiguous by construction. One window shuffle + one hash
    aggregate; all integer arithmetic (epoch seconds), engine-portable.

    Intervals are required non-NULL with end >= start — the first
    violating row aborts the run with a named id (a NULL endpoint would
    otherwise sort NULLS-FIRST into its own broken island, vanish from
    the coverage sum, and still inflate n_intervals — silent garbage).

    Output: (key, n_intervals, n_islands, covered_s) per key.
    """
    from pyspark.sql import Window as W

    s = F.col(start_col).cast("long")
    raw_e = F.col(end_col).cast("long")
    e = F.when(
        s.isNotNull() & raw_e.isNotNull() & (raw_e >= s), raw_e
    ).otherwise(
        F.raise_error(
            F.format_string(
                "invalid interval (NULL bound or end < start) for %s",
                F.col(id_col),
            )
        )
    )
    order = [s.asc(), e.asc(), F.col(id_col).asc()]
    w_prev = (
        W.partitionBy(key_col).orderBy(*order).rowsBetween(
            W.unboundedPreceding, -1
        )
    )
    prev_max_e = F.max(e).over(w_prev)
    is_new = F.when(
        prev_max_e.isNull() | (s > prev_max_e), 1
    ).otherwise(0)
    w_run = W.partitionBy(key_col).orderBy(*order).rowsBetween(
        W.unboundedPreceding, 0
    )
    islands = df.select(
        F.col(key_col).alias("_k"),
        s.alias("_s"),
        e.alias("_e"),
        F.sum(is_new).over(w_run).alias("_island"),
    )
    per_island = islands.groupBy("_k", "_island").agg(
        F.count("*").alias("_n"),
        (F.max("_e") - F.min("_s")).alias("_len"),
    )
    return per_island.groupBy(F.col("_k").alias(key_col)).agg(
        F.sum("_n").alias("n_intervals"),
        F.count("*").alias("n_islands"),
        F.sum("_len").alias("covered_s"),
    )


def interval_proration(
    df: DataFrame,
    start_col: str,
    end_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Calendar-month proration of an interval-scoped value (public
    accounting method — revenue recognition / cost allocation): each
    row's value is split across the months its [start, end] date span
    overlaps, weighted by overlap days — the operation behind "how much
    of this quarter's bookings lands in March".

    Exactness — everything integral: values fix-point to 1e-4 units
    (``round(val*10000)`` of a near-integer double is engine-safe), day
    counts are integer date arithmetic, and the per-row allocation is
    ``floor(val_i·overlap/total + 0.5)`` — floor of an IEEE-exact
    product-then-divide is bit-identical on every engine, unlike
    ``round(double, k)``, whose tie detection differs (Spark rounds the
    SHORTEST DECIMAL REPR of the double — BigDecimal.valueOf — so a
    value a hair under .00005 can round UP there while an exact-binary
    rounder goes down; this operator's first draft failed its oracle on
    exactly that).  Monthly sums of the integral allocations are exact
    BIGINTs; the single trailing division per OUTPUT row converts back
    to currency units.  Conservation: a row's integral allocations sum
    to val_i ± (months-1) half-units.

    Rows with NULL dates/value or end < start carry no allocatable span
    and are excluded (tallied upstream by quality gates, not silently
    guessed at here).

    Scale shape: map-only month explode (bounded by the span length —
    no join, rows never leave their partition) followed by ONE hash
    aggregate on the month key.  At 100 TB the explode factor is the
    mean months-per-span, not data size.  ``val_i·overlap`` must stay
    under 2^53 for the exact double product: |value| < ~2·10^10 at
    45-day spans — far past any currency column.

    Output: (month 'yyyy-MM' string, n_lines, allocated DOUBLE) ordered
    by month.
    """
    s = F.col(start_col).cast("date")
    e = F.col(end_col).cast("date")
    base = df.where(
        s.isNotNull()
        & e.isNotNull()
        & (e >= s)
        & F.col(value_col).isNotNull()
    ).select(
        F.col(id_col).alias("_id"),
        s.alias("_s"),
        e.alias("_e"),
        F.round(F.col(value_col).cast("double") * 10000).cast(
            "bigint"
        ).alias("_vi"),
        (F.datediff(e, s) + 1).alias("_t"),
    )
    months = base.select(
        "*",
        F.explode(
            F.sequence(
                F.trunc("_s", "month"),
                F.trunc("_e", "month"),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("_m"),
    )
    overlap = (
        F.datediff(
            F.least(F.col("_e"), F.last_day(F.col("_m"))),
            F.greatest(F.col("_s"), F.col("_m")),
        )
        + 1
    )
    alloc_i = F.floor(
        (F.col("_vi") * overlap).cast("double") / F.col("_t").cast("double")
        + 0.5
    ).cast("bigint")
    return (
        months.select(
            F.date_format("_m", "yyyy-MM").alias("month"),
            alloc_i.alias("_a"),
        )
        .groupBy("month")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            (F.sum("_a").cast("double") / 10000.0).alias("allocated"),
        )
        .orderBy("month")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    sort_key,
    window: int = 3,
    coarse_key=None,
) -> DataFrame:
    """Sorted-neighborhood ER blocking (Hernández–Stolfo, public
    method): sort records by a blocking key and emit each record paired
    with its ``window`` nearest neighbors in that order — the
    complement of equality blocking (:func:`fuzzy_join`'s ``block_on``)
    for keys where near-misses sort adjacently (names, addresses)
    but never collide on an equality bucket.

    Scale shape — the TWO-LEVEL form, because the textbook single
    global sort is a one-task window: records first hash-partition by
    ``coarse_key`` (default: first character of the sort key), then
    sort and slide WITHIN each coarse block — rank assignment and the
    rank-offset self-join both run per-block, candidates bounded by
    |block|·window.  The blindness to pairs straddling a coarse
    boundary is the method's documented recall trade (same audit as
    equality blocking: ``blocking_quality``).

    Ordering is total — (sort key, id) — so ranks and the emitted pair
    set are deterministic.  Each unordered pair appears ONCE
    (id_a < id_b by rank order).  NULL sort keys cannot be
    neighborhood-sorted and are excluded.

    Output: (id_a, id_b, key_a, key_b, rank_gap) — rank_gap in
    [1, window].
    """
    from pyspark.sql import Window as W

    if window <= 0:
        raise ValueError(
            f"sorted_neighborhood_pairs: window > 0, got {window}"
        )
    key = sort_key if not isinstance(sort_key, str) else F.col(sort_key)
    coarse = (
        coarse_key
        if coarse_key is not None
        else F.substring(key, 1, 1)
    )
    base = df.select(
        F.col(id_col).alias("_id"),
        key.alias("_k"),
        coarse.alias("_blk"),
    ).where(F.col("_k").isNotNull())
    w = W.partitionBy("_blk").orderBy(F.col("_k").asc(), F.col("_id").asc())
    # checkpointed (lazily on the local branch): both sides of the
    # rank-offset self-join read `ranked`, and without materialization
    # the scan + per-block sort + window run TWICE (exchange reuse
    # dedupes the shuffle, not the upstream work).  lineage_cut rather
    # than persist because the operator returns no handle to the
    # internal frame — a persist could never be unpersisted by callers
    # and would pin the blocks until the session died (review-caught);
    # checkpoint blocks/files are reclaimed once the returned frame is
    # garbage collected (ContextCleaner; reliable files via the session
    # factory's cleanCheckpoints=true).  lineage_cut's reliable branch
    # caches through the checkpoint write, so the multi-consumer dedup
    # this materialization exists for holds on both branches.
    # Compact (ids + keys + rank).
    ranked = lineage_cut(
        base.withColumn("_rn", F.row_number().over(w)), eager=False
    )
    left = ranked.select(
        F.col("_blk"),
        F.col("_id").alias("id_a"),
        F.col("_k").alias("key_a"),
        F.col("_rn").alias("_ra"),
    )
    right = ranked.select(
        F.col("_blk"),
        F.col("_id").alias("id_b"),
        F.col("_k").alias("key_b"),
        F.col("_rn").alias("_rb"),
    )
    # rank-offset equi-join: explode each left row to its `window`
    # partner ranks, then join on (block, rank) — a plain shuffled
    # equi-join, never a theta join
    probes = left.select(
        "_blk",
        "id_a",
        "key_a",
        "_ra",
        F.explode(
            F.sequence(F.col("_ra") + 1, F.col("_ra") + window)
        ).alias("_rb"),
    )
    return probes.join(right, ["_blk", "_rb"]).select(
        "id_a",
        "id_b",
        "key_a",
        "key_b",
        (F.col("_rb") - F.col("_ra")).cast("int").alias("rank_gap"),
    )
