"""Round-12 setsim_join decomposition probe.

Measures, in ONE session at sf0.1 (same methodology as bench.py):
1. candidate-pair counts: current per-collision ANY positional filter vs
   the exact cumulative PPJoin positional filter (collision count + last
   collision positions, groupBy replacing the distinct-exchange);
2. warm walls of the full query under both candidate stages;
3. a full-outer diff proving the final (id_a, id_b, jaccard) rows are
   identical (the filter is lossless: it only prunes pairs the exact
   verify would reject).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataengineer_spark.session import build_session  # noqa: E402
from dataengineer_spark.operators.dedup import (  # noqa: E402
    _setsim_sorted_arrays,
    _setsim_candidates,
    transient_persist,
)


def grouped_candidates(arr, t: float, eps: float):
    """Exact cumulative PPJoin positional filter.

    For a candidate pair, every shared token smaller than the LAST
    prefix collision's token lies within BOTH prefixes (tokens sorted by
    one global order), so the collision count c is exactly the shared
    count up to that token and overlap <= c + min(na - pa_last,
    nb - pb_last).  groupBy on the pair replaces the old distinct — the
    same exchange — and the bound is tighter than any single collision's.
    """
    prefix_len = F.col("_n") - F.ceil(F.lit(t) * F.col("_n") - eps) + 1
    prefix = arr.select(
        "_id",
        "_n",
        F.posexplode(F.slice("_toks", 1, prefix_len)).alias("_p", "_w"),
    ).select("_id", "_n", (F.col("_p") + 1).alias("_p"), "_w")
    alpha = F.ceil(
        F.lit(t / (1.0 + t)) * (F.col("_na") + F.col("_nb")) - eps
    )
    return (
        prefix.alias("a")
        .join(prefix.alias("b"), "_w")
        .where(
            (F.col("a._id") < F.col("b._id"))
            & (F.col("a._n") >= t * F.col("b._n") - eps)
            & (F.col("b._n") >= t * F.col("a._n") - eps)
        )
        .select(
            F.col("a._id").alias("_ia"),
            F.col("b._id").alias("_ib"),
            F.col("a._n").alias("_na"),
            F.col("b._n").alias("_nb"),
            F.col("a._p").alias("_pa"),
            F.col("b._p").alias("_pb"),
        )
        .groupBy("_ia", "_ib", "_na", "_nb")
        .agg(
            F.count("*").alias("_c"),
            F.max("_pa").alias("_pa"),
            F.max("_pb").alias("_pb"),
        )
        .where(
            F.col("_c")
            + F.least(
                F.col("_na") - F.col("_pa"), F.col("_nb") - F.col("_pb")
            )
            >= alpha
        )
    )


def verify(arr, cand, t, suffix_only: bool):
    x = arr.select(
        F.col("_id").alias("_ia"), F.col("_toks").alias("_ta"),
        F.col("_n").alias("_xna"),
    )
    y = arr.select(
        F.col("_id").alias("_ib"), F.col("_toks").alias("_tb"),
        F.col("_n").alias("_xnb"),
    )
    v = cand.join(x, "_ia").join(y, "_ib")
    if suffix_only:
        inter = F.col("_c") + F.size(
            F.array_intersect(
                F.slice("_ta", F.col("_pa") + 1, F.col("_xna") - F.col("_pa")),
                F.slice("_tb", F.col("_pb") + 1, F.col("_xnb") - F.col("_pb")),
            )
        )
    else:
        inter = F.size(F.array_intersect("_ta", "_tb"))
    v = v.select("_ia", "_ib", inter.alias("_inter"), "_xna", "_xnb")
    jac = F.col("_inter").cast("double") / (
        F.col("_xna") + F.col("_xnb") - F.col("_inter")
    )
    return v.where(jac >= t).select(
        F.col("_ia").alias("id_a"),
        F.col("_ib").alias("id_b"),
        F.round(jac, 6).alias("jaccard"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session("profile_r12_setsim")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    t, eps = 0.6, 1e-9

    arr = transient_persist(
        _setsim_sorted_arrays(docs, "text", "doc_id", 5)
    )
    n_docs = arr.count()
    print(f"docs: {n_docs}", flush=True)

    spark.sparkContext.setJobDescription("cand: current")
    t0 = time.time()
    n_cur = _setsim_candidates(arr, t, eps).count()
    print(f"current candidates: {n_cur}  ({time.time()-t0:.2f}s)", flush=True)

    spark.sparkContext.setJobDescription("cand: grouped")
    t0 = time.time()
    n_grp = grouped_candidates(arr, t, eps).count()
    print(f"grouped candidates: {n_grp}  ({time.time()-t0:.2f}s)", flush=True)

    # full pipeline walls, warm best-of-3 each, via noop
    def run(df) -> float:
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    import __spark_entry__ as em
    qs = em.queries()

    for label, builder in [
        ("current full query", lambda: qs["q_e2_setsim_join"](spark, sf_dir)),
    ]:
        walls = [run(builder()) for _ in range(3)]
        print(f"{label}: best={min(walls):.3f} runs={[round(w,3) for w in walls]}",
              flush=True)

    for label, suffix in [("grouped+full-verify", False),
                          ("grouped+suffix-verify", True)]:
        def build():
            a = transient_persist(
                _setsim_sorted_arrays(docs, "text", "doc_id", 5)
            )
            return verify(a, grouped_candidates(a, t, eps), t, suffix)
        walls = [run(build()) for _ in range(3)]
        print(f"{label}: best={min(walls):.3f} runs={[round(w,3) for w in walls]}",
              flush=True)

    # result identity: current full query vs grouped+suffix verify
    cur = qs["q_e2_setsim_join"](spark, sf_dir)
    new = verify(arr, grouped_candidates(arr, t, eps), t, True)
    diff = (
        cur.withColumnRenamed("jaccard", "j1")
        .join(new.withColumnRenamed("jaccard", "j2"),
              ["id_a", "id_b"], "full_outer")
        .where(
            F.col("j1").isNull() | F.col("j2").isNull()
            | (F.col("j1") != F.col("j2"))
        )
        .count()
    )
    n_rows = cur.count()
    print(f"result rows: {n_rows}, differing rows (full outer): {diff}",
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
