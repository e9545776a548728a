"""Slowly-changing-dimension maintenance (type 2: full version history).

The reference's label/model dimensions were overwritten in place (its
Postgres tables kept only the latest row); a lake that feeds training
pipelines needs the opposite — every historical version kept with a
validity interval, so any past batch can be re-joined against the
dimension AS OF its own run date (the as-of join in operators/joins.py is
the read-side companion).

``scd2_apply`` is a pure DataFrame transform: one equi-join between the
current version slice and the update batch decides changed/unchanged via
null-safe comparison, then closed rows, new versions, and brand-new keys
union with untouched history.  The update batch is broadcast (dimension
updates are control-plane-sized next to facts); the only shuffle is the
dimension's own key partitioning.  Persist the result with
``Catalog.merge_upsert``/``overwrite`` as the lake's new dimension state.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    eff_col: str = "eff_date",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
    broadcast_updates: bool = True,
) -> DataFrame:
    """Merge an update batch into a type-2 dimension; returns the new dim.

    ``dim`` carries ``key_cols + tracked_cols + valid_from + valid_to +
    is_current`` (``valid_to`` NULL on the current version).  ``updates``
    carries ``key_cols + tracked_cols + eff_col``.  Semantics:

    - a key whose tracked values differ (null-safely) from its current
      version is CLOSED (``valid_to`` = eff, ``is_current`` = false) and a
      new current version opens at eff;
    - an update identical to the current version is a no-op (idempotent
      re-deliveries are absorbed);
    - a key with no current version inserts as a new current row;
    - multiple updates per key in one batch collapse to the latest
      ``eff_col`` (ties break on the tracked values for determinism).

    History rows (``is_current`` = false) pass through untouched.
    ``broadcast_updates`` (default) hints the update batch broadcast —
    dimension updates are control-plane-sized next to facts; set False
    for a bulk backfill batch so the join shuffles on the keys instead.
    """
    out_cols = key_cols + tracked_cols + [valid_from, valid_to, is_current]

    # one update per key: latest eff wins, deterministic tiebreak
    w_order = [F.col(eff_col).desc()] + [F.col(c).asc_nulls_last() for c in tracked_cols]
    from dataengineer_spark.operators.windows import top_k_per_group

    upd = top_k_per_group(updates, key_cols, w_order, 1)

    # coalesce: a NULL is_current row must land in history, not silently
    # vanish from BOTH filters (three-valued logic drops it from each)
    cur_flag = F.coalesce(F.col(is_current), F.lit(False))
    cur = dim.where(cur_flag)
    hist = dim.where(~cur_flag).select(*out_cols)

    u = upd.select(
        *[F.col(c).alias(f"_u_{c}") for c in key_cols],
        *[F.col(c).alias(f"_u_{c}") for c in tracked_cols],
        F.col(eff_col).alias("_u_eff"),
    )
    join_cond = reduce(
        lambda a, b: a & b, [F.col(c) == F.col(f"_u_{c}") for c in key_cols]
    )
    u_side = F.broadcast(u) if broadcast_updates else u
    j = cur.join(u_side, join_cond, "left")

    changed = F.col("_u_eff").isNotNull() & reduce(
        lambda a, b: a | b,
        [~F.col(c).eqNullSafe(F.col(f"_u_{c}")) for c in tracked_cols],
    )

    closed = (
        j.where(changed)
        .select(
            *key_cols,
            *tracked_cols,
            F.col(valid_from),
            F.col("_u_eff").alias(valid_to),
            F.lit(False).alias(is_current),
        )
    )
    kept = j.where(~F.coalesce(changed, F.lit(False))).select(*out_cols)
    new_versions = (
        j.where(changed)
        .select(
            *[F.col(f"_u_{c}").alias(c) for c in key_cols],
            *[F.col(f"_u_{c}").alias(c) for c in tracked_cols],
            F.col("_u_eff").alias(valid_from),
            F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
            F.lit(True).alias(is_current),
        )
    )
    # NOTE: no broadcast here — the anti-join's right side is the (large)
    # dimension's keys; both sides shuffle on the keys and the update side
    # is small, so the exchange is cheap. AQE may still demote to a
    # broadcast where stats justify it.
    brand_new = (
        upd.join(cur.select(*key_cols), key_cols, "left_anti")
        .select(
            *key_cols,
            *tracked_cols,
            F.col(eff_col).alias(valid_from),
            F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
            F.lit(True).alias(is_current),
        )
    )
    return hist.unionByName(kept).unionByName(closed).unionByName(
        new_versions
    ).unionByName(brand_new)


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: list[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Point-in-time dimension resolution — the READ-side companion of

    :func:`scd2_apply`: each fact row joins the dimension VERSION that was
    valid at the fact's timestamp (``valid_from <= ts`` and ``valid_to``
    NULL or ``ts < valid_to``), so historical facts re-join the attributes
    they were processed under, not today's.  Exactly one version matches
    per key in a well-formed history (half-open, non-overlapping
    intervals — what ``scd2_apply`` produces); facts before their key's
    first version (or with no dimension row at all) keep NULL attributes
    via the left join rather than vanishing.

    Scale shape: the dimension history is dimension-sized next to the
    fact table, so it BROADCASTS; the equi keys make this a broadcast
    HASH join with the interval predicate as a post-join filter — never
    a nested-loop range join, and the fact table never shuffles.

    Output: all fact columns + the dimension's attribute columns
    (everything except the key/validity bookkeeping).
    """
    f = facts.alias("_f")
    d = dim.alias("_d")
    ts = F.col(f"_f.{ts_col}")
    on = reduce(
        lambda a, b: a & b,
        [F.col(f"_f.{k}") == F.col(f"_d.{k}") for k in key_cols],
    )
    valid = (ts >= F.col(f"_d.{valid_from}")) & (
        F.col(f"_d.{valid_to}").isNull() | (ts < F.col(f"_d.{valid_to}"))
    )
    attrs = [
        c
        for c in dim.columns
        if c not in set(key_cols) | {valid_from, valid_to, is_current}
    ]
    return f.join(F.broadcast(d), on & valid, "left").select(
        *[F.col(f"_f.{c}") for c in facts.columns],
        *[F.col(f"_d.{c}").alias(c) for c in attrs],
    )
