"""Realistic-vocabulary probe for the PPJoin / exact-cluster family
(VERDICT r8 item 6).

The driver's testdata documents draw from a ~30-word vocabulary, which
makes 5-char shingle sets near-universal: SCALE.md §3a measured the
setsim verify approaching all-pairs ON THAT corpus and correctly blamed
the vocabulary — but the claim "the prefix filter prunes at published
rates on realistic vocabularies" was argued, not measured.  This probe
measures it: it synthesizes corpora with a TRUE Zipf(1) vocabulary of
60k word types (rank drawn log-uniform — P(r) ∝ 1/r — the shape real
text has), seeds ~3% organic near-dups (mutated copies, ~5% token
substitutions), and records through the EXACT production code
(``dedup._setsim_sorted_arrays`` → ``dedup._setsim_candidates`` →
``dedup.setsim_join``):

- candidate pairs emitted by the prefix+size+positional filters,
- the candidate:corpus ratio at two scales (the number that must stay
  ~flat for the filter to be doing its job),
- verified output pairs and end-to-end wall.

For contrast it also prices the exact blocked-compare baseline
(``q_e2_cluster_dedup``'s candidate stage — ALL in-bucket pairs, no
content filter): its candidate count is quadratic in corpus size by
construction, which is exactly why round 9 put
``dedup.guard_bucket_quadratic`` in front of it and why the scale path
is LSH banding.

Deterministic (DuckDB hash(), no random()); runs in a few minutes.
Usage: python tools/vocab_probe_r9.py [workdir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

WORK = sys.argv[1] if len(sys.argv) > 1 else "/tmp/zipf_vocab"
V = 60_000  # word types, Zipf(1) via log-uniform rank
SCALES = [5_000, 50_000]  # docs: bench-equivalent and x10
CLUSTER_SCALES = [5_000, 15_000]  # the quadratic baseline priced small


def gen(n_docs: int) -> str:
    """documents(doc_id, text): 40-160 words, ranks log-uniform over V;
    ~3% of docs are mutated copies of an earlier doc (same length, ~5%
    of positions substituted) so the corpus has organic near-dups."""
    out = f"{WORK}/docs_{n_docs}.parquet"
    if os.path.exists(out):
        return out
    con = duckdb.connect()
    con.execute("SET preserve_insertion_order=false")
    word = (
        "'w' || CAST(CAST(exp(ln({v}) * "
        "((hash({d} * 131 + w * 17 + 5) % 1000000) / 1000000.0)) "
        "AS BIGINT) AS VARCHAR)"
    )
    con.execute(f"""
        COPY (
        WITH d AS (
          SELECT i,
                 40 + hash(i * 53) % 121 AS n_words,
                 (i >= 100 AND hash(i * 97) % 33 = 0) AS is_mut,
                 greatest(i - (1 + hash(i * 3) % 50), 0) AS base
          FROM range({n_docs}) t(i)
        ), words AS (
          SELECT d.i, q.w,
                 CASE WHEN d.is_mut AND hash(d.i * 13 + q.w * 7) % 20 != 0
                      THEN {word.format(v=V, d='d.base')}
                      ELSE {word.format(v=V, d='d.i')} END AS word
          FROM d CROSS JOIN range(161) q(w)
          WHERE q.w < CASE WHEN d.is_mut
                           THEN 40 + hash(d.base * 53) % 121
                           ELSE d.n_words END
        )
        SELECT i AS doc_id, string_agg(word, ' ' ORDER BY w) AS text
        FROM words GROUP BY i
        ) TO '{out}' (FORMAT PARQUET)""")
    return out


def main() -> None:
    os.makedirs(WORK, exist_ok=True)
    from pyspark.sql import functions as F

    from dataengineer_spark.operators import dedup, textops
    from dataengineer_spark.session import build_session
    from dataengineer_spark.tuning import transient_persist

    spark = build_session("vocab_probe_r9")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    print(f"{'corpus':>10s} {'docs':>7s} {'cand':>12s} {'cand/doc':>9s} "
          f"{'out_pairs':>9s} {'wall_s':>7s}", flush=True)

    for n in SCALES:
        docs = spark.read.parquet(gen(n))
        docs.count()
        # candidate count through the production stages
        arr = transient_persist(
            dedup._setsim_sorted_arrays(docs, "text", "doc_id", 5)
        )
        n_cand = dedup._setsim_candidates(arr, 0.6, 1e-9).count()
        arr.unpersist()
        t0 = time.time()
        out = dedup.setsim_join(docs, "text", "doc_id",
                                threshold=0.6, shingle_size=5)
        n_out = out.count()
        wall = time.time() - t0
        print(f"{'setsim':>10s} {n:>7d} {n_cand:>12d} {n_cand / n:>9.2f} "
              f"{n_out:>9d} {wall:>7.1f}", flush=True)

    for n in CLUSTER_SCALES:
        docs = spark.read.parquet(gen(n))
        docs.count()
        # q_e2_cluster_dedup's candidate stage: ALL pairs in each
        # token-count/5 bucket — no content filter, quadratic by
        # construction (allow path of guard_bucket_quadratic)
        sh = docs.select(
            "doc_id",
            F.array_distinct(F.transform(
                dedup.word_shingles(F.col("text"), 3),
                lambda s: F.xxhash64(s),
            )).alias("_sh"),
            F.floor(textops.token_count(F.col("text")) / 5).alias("_bk"),
        )
        counts = sh.groupBy("_bk").count()
        n_cand = int(counts.agg(F.coalesce(F.sum(
            F.col("count").cast("double") * (F.col("count") - 1) / 2
        ), F.lit(0.0))).first()[0])
        a = sh.select(F.col("doc_id").alias("id_a"),
                      F.col("_sh").alias("_sa"), "_bk")
        b = sh.select(F.col("doc_id").alias("id_b"),
                      F.col("_sh").alias("_sb"), "_bk")
        t0 = time.time()
        pairs = (
            a.join(b, "_bk")
            .where(F.col("id_a") < F.col("id_b"))
            .where(F.size(F.array_intersect("_sa", "_sb")) * 3
                   >= F.size("_sa") + F.size("_sb"))
            .select("id_a", "id_b")
        )
        n_out = pairs.count()
        wall = time.time() - t0
        print(f"{'cluster':>10s} {n:>7d} {n_cand:>12d} {n_cand / n:>9.2f} "
              f"{n_out:>9d} {wall:>7.1f}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
