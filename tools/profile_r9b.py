"""Stage breakdown of q_prep_decontaminate / q_e2_minhash_neardup at sf0.1.

Which stage of the r8 rewrite added the ~1.2 s that fan_out doesn't
explain: signatures, banding join, the lazy serialized lineage_cut on
cand, or the hashed verify?
"""
from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataengineer_spark.session import build_session
from dataengineer_spark.operators import dedup as D
from dataengineer_spark.tuning import fan_out, lineage_cut


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("profile_r9b")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from dataengineer_spark.testdata import load_table, normalized_sf_dir
    import tempfile

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    shadow = os.path.join(tempfile.gettempdir(), f"spark_graft_lake_{sf_name}")
    sf_dir = normalized_sf_dir(spark, sf_dir, shadow)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.count()

    def drop_blocks() -> None:
        gc.collect()
        spark.catalog.clearCache()
        try:
            for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
                rdd.unpersist()
        except Exception:
            pass

    def t(label, builder, n=3) -> None:
        best = None
        for _ in range(n):
            t0 = time.time()
            builder().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            drop_blocks()
        print(f"{label:44s} {best:8.3f}")

    bench = docs.where(F.col("doc_id") % 50 == 7).select(
        F.col("doc_id").alias("bench_id"), "text"
    )

    def decon_stage(upto: str, cut: bool = True, fan: bool = True):
        base_c = docs.select(F.col("doc_id").alias("corpus_id"),
                             F.col("text").alias("_t"))
        base_b = bench.select("bench_id", F.col("text").alias("_t"))
        if fan:
            base_c = fan_out(base_c)
            base_b = fan_out(base_b)
        sig_c = base_c.select(
            "corpus_id",
            D.minhash_from_hashes(
                D.char_shingle_hashes(F.col("_t"), 5, False), 32, 42
            ).alias("_sig"),
        )
        if upto == "sig":
            return sig_c
        sig_b = base_b.select(
            "bench_id",
            D.minhash_from_hashes(
                D.char_shingle_hashes(F.col("_t"), 5, False), 32, 42
            ).alias("_sig"),
        )
        banded_c = D._band_buckets(sig_c, "corpus_id", 32, 8)
        banded_b = D._band_buckets(sig_b, "bench_id", 32, 8)
        cand = (
            banded_c.join(F.broadcast(banded_b), ["band", "bucket"])
            .select("corpus_id", "bench_id").dropDuplicates()
        )
        if upto == "cand":
            return cand
        if cut:
            cand = lineage_cut(cand, eager=False, serialized=True)
        cand_ids = cand.select("corpus_id").dropDuplicates()
        sh_c = base_c.join(F.broadcast(cand_ids), "corpus_id", "left_semi").select(
            "corpus_id", D._hashed_shingles(F.col("_t"), 5).alias("_sh_a")
        )
        sh_b = base_b.select(
            "bench_id", D._hashed_shingles(F.col("_t"), 5).alias("_sh_b")
        )
        return (
            cand.join(sh_c, "corpus_id")
            .join(F.broadcast(sh_b), "bench_id")
            .select("corpus_id", "bench_id",
                    F.round(D._jaccard("_sh_a", "_sh_b"), 6).alias("jaccard"))
            .where(F.col("jaccard") >= 0.5)
        )

    t("decon: signatures only (fan)", lambda: decon_stage("sig"))
    t("decon: signatures only (nofan)", lambda: decon_stage("sig", fan=False))
    t("decon: cand join (fan)", lambda: decon_stage("cand"))
    t("decon: cand join (nofan)", lambda: decon_stage("cand", fan=False))
    t("decon: full, cut (current)", lambda: decon_stage("full", cut=True))
    t("decon: full, NO cut", lambda: decon_stage("full", cut=False))
    t("decon: full, NO cut, nofan",
      lambda: decon_stage("full", cut=False, fan=False))
    t("decon: entry fn (reference)",
      lambda: D.minhash_lsh_join(docs, bench, threshold=0.5))


if __name__ == "__main__":
    main()
