"""Event-time analytics, batch form (E10).

Tumbling/sliding windows via ``window()``, sessionization both ways:
``session_window`` (native) and the lag+cumsum form (SQL-expressible, used
by the DuckDB oracle). All are single-shuffle group-bys on (window, keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _flatten_window(df: DataFrame, window_col: str = "_w") -> DataFrame:
    """Expand the window struct into window_start/window_end columns."""
    others = [c for c in df.columns if c != window_col]
    return df.select(
        F.col(f"{window_col}.start").alias("window_start"),
        F.col(f"{window_col}.end").alias("window_end"),
        *others,
    )


def tumbling(
    df: DataFrame, ts_col: str, duration: str, keys: list[str], aggs: list[Column]
) -> DataFrame:
    """Fixed non-overlapping event-time windows."""
    out = df.groupBy(F.window(ts_col, duration).alias("_w"), *keys).agg(*aggs)
    return _flatten_window(out)


def sliding(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows."""
    out = df.groupBy(F.window(ts_col, duration, slide).alias("_w"), *keys).agg(*aggs)
    return _flatten_window(out)


def funnel_counts(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered funnel: users reaching step i = those with a step-i event

    strictly after their step-(i-1) entry time (first-touch semantics).
    One hash aggregate + one broadcast-able join per step, all keyed on
    the user column — the exchanges reuse one partitioning. Output:
    (step, event_type, n_users) per funnel stage.
    """
    if not steps:
        raise ValueError("funnel_counts: steps must be a non-empty list")
    reached = None  # DataFrame(user, _t): entry time into the previous step
    counts = []
    for i, step in enumerate(steps):
        ev = df.where(F.col(type_col) == step)
        if reached is None:
            reached = ev.groupBy(user_col).agg(F.min(ts_col).alias("_t"))
        else:
            reached = (
                ev.join(reached, user_col)
                .where(F.col(ts_col) > F.col("_t"))
                .groupBy(user_col)
                .agg(F.min(ts_col).alias("_t"))
            )
        counts.append(
            reached.agg(
                F.lit(i + 1).alias("step"),
                F.lit(step).alias("event_type"),
                F.count("*").alias("n_users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def sessionize_native(
    df: DataFrame, ts_col: str, gap: str, keys: list[str], aggs: list[Column]
) -> DataFrame:
    """Gap-based sessions via native ``session_window`` (works in batch)."""
    out = df.groupBy(F.session_window(ts_col, gap).alias("_w"), *keys).agg(*aggs)
    return _flatten_window(out)


def sessionize_lag(
    df: DataFrame,
    ts_col: str,
    gap_seconds: int,
    keys: list[str],
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Gap-based session assignment via lag + cumulative sum — the

    SQL-expressible form (same shape DuckDB can run): a new session starts
    where the gap to the previous event strictly EXCEEDS ``gap_seconds``
    (>): verified against ``session_window``, which MERGES an event
    arriving exactly ``gap`` after the last one (touching windows
    coalesce), so the strict inequality is the parity-correct boundary
    — pinned by a test. The running count of session starts within the
    key partition is the session number. Adds ``session_id`` (per-key,
    1-based).

    Gap arithmetic is in integer microseconds (``unix_micros``) so it is
    bit-exact and engine-portable. Pass ``tiebreakers`` to make the window
    order total when timestamps can repeat within a key — without a total
    order the assignment is nondeterministic.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (tiebreakers or [])]
    w = W.partitionBy(*keys).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)
    is_new = F.when(
        prev_ts.isNull() | (gap_us > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn("_new", is_new).withColumn(
        "session_id", F.sum("_new").over(w.rowsBetween(W.unboundedPreceding, 0))
    ).drop("_new")


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Classic cohort-retention matrix: users are cohorted by the day of

    their first event; each (cohort_day, period_day) cell counts the
    distinct cohort members active ``period_day`` days after joining.

    Shape: one hash aggregate on the user column for first-touch, one
    distinct-project of (user, day) activity, an equi-join back on the
    user column (the exchanges share one partitioning), and a final
    small aggregate on (cohort_day, period_day) — cells are bounded by
    days², not rows, so the output is tiny at any scale.  No window
    functions, no global sort; survives a 1000-executor shuffle on
    ``user_col`` unchanged.
    """
    first = df.groupBy(user_col).agg(
        F.to_date(F.min(ts_col)).alias("cohort_day")
    )
    activity = df.select(
        F.col(user_col), F.to_date(ts_col).alias("_day")
    ).distinct()
    return (
        activity.join(first, user_col)
        .select(
            "cohort_day",
            F.datediff("_day", "cohort_day").alias("period_day"),
            F.col(user_col),
        )
        .groupBy("cohort_day", "period_day")
        .agg(F.count_distinct(user_col).alias("n_users"))
    )


def resample_ffill(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    scale: int = 6,
) -> DataFrame:
    """Daily resample + forward fill per key: aggregate ``value_col`` to a

    per-day mean, densify each key's [min_day, max_day] span with
    ``sequence``-exploded calendar days, and carry the most recent
    observed day-mean into the gaps (``last`` with ``ignorenulls`` over
    an unbounded-preceding rows frame).

    The day-mean uses exact decimal sums over values pre-rounded to
    ``scale`` digits so a SQL engine replays bit-identical floats.  One
    shuffle on the keys does the day-aggregate, the span, and the fill
    window; the explode is bounded by each key's span in days (never by
    row count), so a key with a million events and a 90-day span still
    produces 90 grid rows.  Output: keys, day, day_avg (null on gap
    days), filled.
    """
    day = F.to_date(ts_col).alias("_day")
    dec = F.round(F.col(value_col), scale).cast("decimal(27,%d)" % scale)
    daily = df.select(*keys, day, dec.alias("_v")).groupBy(*keys, "_day").agg(
        F.round(F.sum("_v").cast("double") / F.count("_v"), scale).alias("day_avg")
    )
    spans = daily.groupBy(*keys).agg(
        F.min("_day").alias("_lo"), F.max("_day").alias("_hi")
    )
    grid = spans.select(
        *keys,
        F.explode(F.sequence("_lo", "_hi", F.expr("interval 1 day"))).alias("_day"),
    )
    joined = grid.join(daily, [*keys, "_day"], "left")
    w = (
        W.partitionBy(*keys)
        .orderBy(F.col("_day").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return joined.select(
        *keys,
        F.col("_day").alias("day"),
        "day_avg",
        F.last("day_avg", ignorenulls=True).over(w).alias("filled"),
    )


def touch_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    value_col: str,
    touch_types: list[str],
    conversion_type: str,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """First-touch and last-touch conversion attribution in one pass:

    within each user's event history (ordered by ``ts_col`` plus
    ``tiebreakers`` for a total order), every conversion event credits
    (a) the touch type it saw first ever, and (b) the most recent touch
    type strictly before it — both via ``first``/``last`` with
    ``ignorenulls`` over an unbounded-preceding frame ending at -1, so
    the conversion row never attributes to itself.

    One shuffle on the user column, O(1) window state per row, and a
    final tiny aggregate on (model, touch_type) — the same plan shape at
    150 users or 150 million.  Conversions with no preceding touch fall
    into the ``(direct)`` bucket.  Conversion values are summed as exact
    decimals post-round so the figure is engine-portable.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (tiebreakers or [])]
    w = (
        W.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    touch = F.when(F.col(type_col).isin(touch_types), F.col(type_col))
    tagged = df.select(
        F.col(user_col),
        F.col(type_col),
        F.round(F.col(value_col), 6).cast("decimal(27,6)").alias("_v"),
        F.first(touch, ignorenulls=True).over(w).alias("_first_touch"),
        F.last(touch, ignorenulls=True).over(w).alias("_last_touch"),
    ).where(F.col(type_col) == conversion_type)
    models = []
    for model, col in [("first_touch", "_first_touch"), ("last_touch", "_last_touch")]:
        models.append(
            tagged.groupBy(
                F.lit(model).alias("model"),
                F.coalesce(F.col(col), F.lit("(direct)")).alias("touch_type"),
            ).agg(
                F.count("*").alias("n_conversions"),
                F.round(F.sum("_v").cast("double"), 2).alias("total_value"),
            )
        )
    return models[0].unionByName(models[1])


def trailing_anomalies(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    lookback: int = 20,
    z_threshold: float = 3.0,
    min_history: int = 5,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Per-key anomaly flags: an event is anomalous when its value sits

    more than ``z_threshold`` sample standard deviations from the mean of
    the PRECEDING ``lookback`` events (frame ends at -1, so the point
    never scores against itself).  One shuffle on the keys; the bounded
    rows-frame keeps window state O(lookback) per key — the metric-drift
    tripwire over event streams.  Events with under ``min_history``
    preceding points emit NULL z (cold start is not an anomaly).

    The z-score is computed from exact sums (Σv, Σv², n over the frame)
    rather than ``stddev`` so the SQL oracle reproduces the same float
    sequence; ``tiebreakers`` make the order total when timestamps repeat.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (tiebreakers or [])]
    w = (
        W.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(-lookback, -1)
    )
    n = F.count(value_col).over(w)
    s1 = F.sum(value_col).over(w)
    s2 = F.sum(F.col(value_col) * F.col(value_col)).over(w)
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / (n - 1)
    z = F.when(
        (n >= min_history) & (var > 0),
        (F.col(value_col) - mean) / F.sqrt(var),
    )
    return df.select(
        *keys,
        ts_col,
        value_col,
        F.round(z, 6).alias("z_score"),
        F.coalesce(F.abs(z) > z_threshold, F.lit(False)).alias("is_anomaly"),
    )


def period_over_period(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    period_days: int = 7,
    scale: int = 2,
) -> DataFrame:
    """Period-over-period change report (day granularity): per-key daily

    totals (exact decimal sums over pre-rounded values) joined against
    themselves shifted ``period_days`` forward — an equi-join on
    (keys, day), NOT a lag over row position, so calendar gaps never
    misalign the comparison.  One shuffle for the daily aggregate; the
    self-join reuses its partitioning.  Days without a prior period —
    or with a prior total of exactly 0 (pct change undefined; unguarded
    division is a hard DIVIDE_BY_ZERO under ANSI mode) — emit NULL
    pct_change.

    Output: keys, day, total, prev_total, pct_change (rounded 6).
    """
    dec = F.round(F.col(value_col), 6).cast("decimal(27,6)")
    daily = df.select(
        *keys, F.to_date(ts_col).alias("day"), dec.alias("_v")
    ).groupBy(*keys, "day").agg(
        F.round(F.sum("_v").cast("double"), scale).alias("total")
    )
    prev = daily.select(
        *keys,
        F.date_add("day", period_days).alias("day"),
        F.col("total").alias("prev_total"),
    )
    out = daily.join(prev, [*keys, "day"], "left")
    pct = F.when(
        F.col("prev_total") != 0,
        (F.col("total") - F.col("prev_total")) / F.col("prev_total"),
    )
    return out.select(
        *keys, "day", "total", "prev_total",
        F.round(pct, 6).alias("pct_change"),
    )


def transition_counts(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order transition matrix of event types — per user, each

    event's successor under a total, deterministic order (``ts`` with the
    unique ``id_col`` as the tiebreak — without it, same-timestamp pairs
    would flip between runs and engines). The sequence walk is ONE lead()
    window partitioned by user (each user's history sorts within its own
    task — no global sort), and the matrix is one hash aggregate over
    ≤ |types|² keys. This is the Markov-chain table behind next-event
    prediction features and funnel-drift monitoring.

    Output: (event_type, next_type, n) ordered by n desc, then the pair.
    """
    w = W.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    pairs = df.select(
        F.col(type_col).alias("event_type"),
        F.lead(type_col).over(w).alias("next_type"),
    )
    return (
        pairs.where(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "event_type", "next_type")
    )


def session_transcripts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Ordered per-session transcripts — the conversation/trajectory

    assembly step between raw event logs and SFT/replay training rows:
    gap-sessionize (:func:`sessionize_lag`, integer-µs arithmetic), then
    per session collect the step sequence under the TOTAL (ts, id) order
    (``array_sort`` over structs — without the unique id tiebreak,
    same-timestamp steps would flip between runs) and join it into one
    string. One window shuffle + one hash aggregate; each session's
    steps serialize through its own group only — no global sort.

    Output: (user, session_id, n_turns, started_s, transcript) where
    transcript is ' -> '-joined step types and started_s epoch seconds.
    """
    s = sessionize_lag(
        df, ts_col, gap_seconds, [user_col], tiebreakers=[id_col]
    )
    steps = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(id_col).alias("id"),
                F.col(type_col).alias("t"),
            )
        )
    )
    per = s.groupBy(user_col, "session_id").agg(
        F.count("*").alias("n_turns"),
        F.min(F.col(ts_col).cast("long")).alias("started_s"),
        F.concat_ws(" -> ", F.transform(steps, lambda x: x["t"])).alias("_tr"),
        F.count(F.col(type_col)).alias("_nt"),  # COUNT skips NULLs
    )
    # SQL string_agg semantics: NULL steps are skipped, and a session
    # with NO non-NULL step yields a NULL transcript — concat_ws alone
    # would return '' there, silently conflating "unknown" with "empty"
    return per.select(
        user_col,
        "session_id",
        "n_turns",
        "started_s",
        F.when(F.col("_nt") > 0, F.col("_tr")).alias("transcript"),
    )


#: powers of two 2^30 .. 2^0 as a literal lookup — the exact dyadic
#: half-life weights the decayed-activity score uses (index = decay steps;
#: >30 steps decays to exactly 0). Integer weights keep the sum exact at
#: any row count/order; the single final division by 2^30 is exact too.
_DECAY_WEIGHTS = [1 << (30 - k) for k in range(31)]


def decayed_activity(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    half_life_days: int = 1,
) -> DataFrame:
    """Per-key exponentially time-decayed activity score with EXACT

    arithmetic: each event weighs 2^-(age/half_life) anchored at the
    table's max timestamp — but computed as integer 2^(30-steps) weights
    from a literal lookup, summed in int64 and divided once by 2^30, so
    the score is bit-identical on every engine and under every summation
    order (a float exp()/pow() per row would be neither — libm results
    differ across engines). Events older than 30 half-lives weigh
    exactly 0. One aggregate for the anchor (one-row broadcast), one
    hash aggregate for the scores.

    Output: (key, n_events, decayed_score) — the recency-weighted
    engagement table behind retention scoring and sample re-weighting.
    """
    from dataengineer_spark.tuning import array_lit

    if half_life_days <= 0:
        raise ValueError(f"half_life_days must be positive, got {half_life_days}")
    ets = F.col(ts_col).cast("long")
    anchor = df.agg(F.max(ets).alias("_mx"))
    steps = F.floor((F.col("_mx") - ets) / F.lit(86400 * half_life_days))
    wi = F.when(
        steps <= 30,
        F.element_at(array_lit(_DECAY_WEIGHTS), steps.cast("int") + 1),
    ).otherwise(F.lit(0).cast("long"))
    return (
        df.crossJoin(F.broadcast(anchor))
        .select(F.col(key_col), wi.alias("_w"))
        .groupBy(key_col)
        .agg(
            F.count("*").alias("n_events"),
            (F.sum("_w") / F.lit(float(1 << 30))).alias("decayed_score"),
        )
    )

def cusum_changepoint(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-key CUSUM change-point locator (Page's cumulative-sum method,
    public): the event time at which the running sum of deviations from
    the key's mean attains its largest magnitude — the classic single
    change-point estimate for a level shift in a metric stream.

    Exactness: values are fixed-pointed to ``1/scale`` units (BIGINT
    micro-units — the deterministic cast both engines share), so the
    running sum is integer-exact.  The mean is never divided out:
    ``|cusum_i| = |cum_i - i*mean|`` is maximized exactly where
    ``|n*cum_i - i*S|`` is (n > 0 a positive constant per key), and the
    scaled form ``n*cum_i - i*S`` is exact integer arithmetic — argmax
    ties cannot come from float fuzz, only from true equality, broken
    by (ts, id).  Both the running/total SUMS and the products run in
    DECIMAL (28- and 38-digit budgets) so a 100 TB key cannot silently
    wrap a BIGINT accumulator anywhere in the chain (Spark wraps,
    DuckDB errors — divergence either way).  The reported ``cusum`` is
    one double division per OUTPUT row, after the argmax.

    NULL values carry no deviation signal and are excluded up front
    (their position would still shift i otherwise); NULL keys have no
    series and are excluded.

    Scale shape: one shuffle on the key (the ordered cumulative window
    and the per-key totals share the hash partitioning); the argmax is
    a top-1-per-key window over the same partitioning.  A single key's
    series must fit one task's sort — the same bound every ordered
    window in the engine carries.

    Output: (key, change_ts, change_id, n, cusum) — cusum in original
    value units, rounded to 6.
    """
    from dataengineer_spark.operators.windows import top_k_per_group

    v_int = F.round(F.col(value_col).cast("double") * scale).cast("bigint")
    base = df.where(
        F.col(value_col).isNotNull() & F.col(key_col).isNotNull()
    ).select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_eid"),
        v_int.alias("_v"),
    )
    w_key = W.partitionBy("key")
    w_ord = (
        W.partitionBy("key")
        .orderBy(F.col("_ts").asc(), F.col("_eid").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # the window sums themselves run in DECIMAL so a huge key cannot
    # silently wrap a BIGINT accumulator (Spark wraps, DuckDB promotes
    # to HUGEINT then errors on the cast — divergence either way;
    # review-caught).  Width budget: value sums get 28 digits, row
    # counts 10, so the products land at 10+28 → DECIMAL(38,0) on BOTH
    # engines without tripping DuckDB's hard 38-digit cap or Spark's
    # precision-loss reduction.
    dec_sum = "decimal(28,0)"
    dec_cnt = "decimal(10,0)"
    v_dec = F.col("_v").cast("decimal(18,0)")
    cum = F.sum(v_dec).over(w_ord).cast(dec_sum)
    i = F.row_number().over(
        W.partitionBy("key").orderBy(F.col("_ts").asc(), F.col("_eid").asc())
    ).cast(dec_cnt)
    n = F.count("*").over(w_key).cast(dec_cnt)
    total = F.sum(v_dec).over(w_key).cast(dec_sum)
    scored = base.select(
        "key",
        "_ts",
        "_eid",
        F.count("*").over(w_key).alias("n"),
        (n * cum - i * total).alias("_scaled"),
    )
    top = top_k_per_group(
        scored,
        ["key"],
        [F.abs(F.col("_scaled")).desc(), F.col("_ts").asc(), F.col("_eid").asc()],
        1,
    )
    return top.select(
        "key",
        F.col("_ts").alias("change_ts"),
        F.col("_eid").alias("change_id"),
        F.col("n").cast("bigint").alias("n"),
        F.round(
            F.col("_scaled").cast("double")
            / (F.col("n").cast("double") * float(scale)),
            6,
        ).alias("cusum"),
    )


def seasonal_anomaly(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    z: float = 3.0,
    scale: int = 1_000_000,
) -> DataFrame:
    """Seasonal-baseline anomaly flags (public method — the day-of-week
    profile): each event's value is compared against the mean ± z·σ of
    its OWN (key, day-of-week) cell, so a Sunday dip never pages
    against a weekday baseline — the complement of the trailing-window
    z-score (``anomaly_flags``), which chases level shifts but aliases
    weekly seasonality.

    Exactness: values fix-point to 1/``scale`` units and the cell
    moments run entirely in that integral space — Σv as DECIMAL(28,0),
    Σv² as DECIMAL(19,0)×DECIMAL(19,0) (38 digits, exactly DuckDB's
    hard width cap — a fractional DECIMAL's square would blow past it),
    so float order can never leak; the variance clamps at zero before
    the sqrt and the flag compares micro-unit doubles derived from
    those exact sums.  Day-of-week is an integer 1..7 (Sunday=1 — an
    oracle on an engine whose weekday is 0-based shifts by one).  NULL
    values/keys carry no signal and are excluded; a cell with n < 2
    has no dispersion estimate and flags nothing.  Magnitude bound:
    the micro-unit cast saturates (Spark) or errors (an oracle engine)
    past |value| ≈ 9.2·10^12 — far beyond metric data; lower ``scale``
    if values are astronomical.

    Scale shape: one (key, dow) aggregate — (keys×7)-bounded — joined
    back broadcast; the corpus never shuffles.  Output: flagged events
    only: (key, id, ts, value, dow, cell_mean, cell_std), moments in
    original units rounded to 6.
    """
    v_int = F.round(F.col(value_col).cast("double") * scale).cast("bigint")
    base = df.where(
        F.col(value_col).isNotNull() & F.col(key_col).isNotNull()
    ).select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("id"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("value"),
        F.dayofweek(F.to_date(ts_col)).alias("dow"),
        v_int.alias("_vi"),
    )
    vd = F.col("_vi").cast("decimal(19,0)")
    cells = base.groupBy("key", "dow").agg(
        F.count("*").alias("_n"),
        F.sum(vd).alias("_s"),
        F.sum(vd * vd).alias("_s2"),
    )
    from dataengineer_spark.operators.aggregates import exact_moment_stats

    mean_u, sd_u = exact_moment_stats(
        F.col("_n"), F.col("_s"), F.col("_s2")
    )
    moments = cells.select(
        "key",
        "dow",
        mean_u.alias("_m"),
        sd_u.alias("_sd"),
    )
    joined = base.join(F.broadcast(moments), ["key", "dow"])
    flagged = joined.where(
        F.col("_sd").isNotNull()
        & (
            F.abs(F.col("_vi").cast("double") - F.col("_m"))
            > F.lit(z) * F.col("_sd")
        )
    )
    return flagged.select(
        "key",
        "id",
        "ts",
        "value",
        "dow",
        F.round(F.col("_m") / scale, 6).alias("cell_mean"),
        F.round(F.col("_sd") / scale, 6).alias("cell_std"),
    )


def conversion_lag_report(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    from_step: str,
    to_step: str,
    probs: list[float] | None = None,
) -> DataFrame:
    """Funnel-latency report (the product question behind every funnel:
    not just HOW MANY convert but HOW LONG it takes): per first-touch
    cohort month, exact percentiles of the lag between each user's
    first ``from_step`` event and their first ``to_step`` event AFTER
    it.  First-touch semantics match :func:`funnel_counts`; users who
    never reach ``to_step`` simply don't contribute a lag (conversion
    COUNTS are the funnel's job; this is the latency view).

    Lags are integer epoch-second differences (exact); percentiles are
    the engine's exact interpolated form (``aggregates.percentiles`` —
    the same quantile_cont semantics an oracle replays), grouped by
    cohort so no task ever sorts more than one cohort's converters.

    Scale shape: two user-keyed aggregates + one user-keyed join (the
    exchanges share a partitioning), then a cohort-keyed percentile
    window — cohort-month groups, converter-bounded.  Output: (cohort
    'yyyy-MM', n_converted, p50_lag, p90_lag) seconds rounded to 4.
    """
    from dataengineer_spark.operators.aggregates import (
        pct_col_names,
        percentiles,
    )

    probs = probs or [0.5, 0.9]
    f = (
        df.where(
            (F.col(type_col) == from_step) & F.col(user_col).isNotNull()
        )
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_f_ts"))
    )
    t = (
        df.where(F.col(type_col) == to_step)
        .join(f, user_col)
        .where(F.col(ts_col) > F.col("_f_ts"))
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t_ts"))
    )
    lags = f.join(t, user_col).select(
        F.date_format("_f_ts", "yyyy-MM").alias("cohort"),
        (
            F.col("_t_ts").cast("long") - F.col("_f_ts").cast("long")
        ).cast("double").alias("_lag_s"),
    )
    pcts = percentiles(lags, ["cohort"], "_lag_s", probs)
    counts = lags.groupBy("cohort").agg(
        F.count("*").cast("bigint").alias("n_converted")
    )
    out_cols = pct_col_names(probs)
    return (
        counts.join(pcts, "cohort")
        .select(
            "cohort",
            "n_converted",
            *[F.round(c, 4).alias(f"{c}_lag") for c in out_cols],
        )
        .orderBy("cohort")
    )


def burstiness_report(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
) -> DataFrame:
    """Inter-arrival burstiness per key (public metric — the coefficient
    of variation of gaps): CV ≈ 1 is Poisson-like arrival, CV ≫ 1 is
    bursty (retry storms, batch dumps masquerading as organic events),
    CV ≪ 1 is a metronome (schedulers, bots) — the traffic-shape read
    behind rate-limit and anomaly-threshold decisions.

    Gaps are integer epoch-second differences under the total (ts, id)
    order (exact); moments are integer-exact (Σg, Σg² as DECIMAL —
    a day-long gap squared still fits 38 digits), variance clamps at
    zero before the sqrt, and CV divides two doubles derived from the
    exact sums.  NULL keys/timestamps are excluded; a key with < 3
    events has < 2 gaps and reports NULL cv.

    Scale shape: one window shuffle on the key (lag), one key aggregate
    on the same partitioning.  Output: (key, n_gaps, mean_gap_s, cv),
    rounded to 6.
    """
    base = df.where(
        F.col(key_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(key_col).alias("key"),
        F.col(ts_col).cast("long").alias("_es"),
        F.col(id_col).alias("_id"),
    )
    w = W.partitionBy("key").orderBy(F.col("_es").asc(), F.col("_id").asc())
    gaps = base.select(
        "key", (F.col("_es") - F.lag("_es").over(w)).alias("_g")
    ).where(F.col("_g").isNotNull())
    gd = F.col("_g").cast("decimal(19,0)")
    agg = gaps.groupBy("key").agg(
        F.count("*").cast("bigint").alias("n_gaps"),
        F.sum(gd).alias("_s"),
        F.sum(gd * gd).alias("_s2"),
    )
    from dataengineer_spark.operators.aggregates import exact_moment_stats

    mean, sd = exact_moment_stats(
        F.col("n_gaps"), F.col("_s"), F.col("_s2")
    )
    cv = F.when(sd.isNotNull() & (mean > 0), sd / mean)
    return agg.select(
        "key",
        "n_gaps",
        F.round(mean, 6).alias("mean_gap_s"),
        F.round(cv, 6).alias("cv"),
    ).orderBy("key")
