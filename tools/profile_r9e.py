"""One-session incremental profile of q_prep_decontaminate at sf0.1.

Every stage timed best-of-3 in the SAME session so host variance is
shared; stages are cumulative prefixes of the real pipeline.
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
    spark = build_session("profile_r9e")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from dataengineer_spark.testdata import load_table, normalized_sf_dir
    import tempfile

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    shadow = os.path.join(tempfile.gettempdir(), f"spark_graft_lake_{sf_name}")
    sf_dir = normalized_sf_dir(spark, sf_dir, shadow)
    raw = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    raw.count()

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
        print(f"{label:56s} {best:8.3f}", flush=True)

    def build(upto, cut="lazy", verify="hashed"):
        docs = fan_out(raw)  # entry _docs does this
        bench = docs.where(F.col("doc_id") % 50 == 7).select(
            F.col("doc_id").alias("bench_id"), "text"
        )
        base_c = fan_out(docs.select(F.col("doc_id").alias("corpus_id"),
                                     F.col("text").alias("_t")))
        base_b = fan_out(bench.select("bench_id", F.col("text").alias("_t")))
        sig = lambda fr, idc: fan_out(fr).select(
            idc,
            D.minhash_from_hashes(
                D.char_shingle_hashes(F.col("_t"), 5, False), 32
            ).alias("_sig"),
        )
        sig_c, sig_b = sig(base_c, "corpus_id"), sig(base_b, "bench_id")
        if upto == "sig_c":
            return sig_c
        if upto == "sig_b":
            return sig_b
        banded_c = D._band_buckets(sig_c, "corpus_id", 32, 8)
        banded_b = D._band_buckets(sig_b, "bench_id", 32, 8)
        if upto == "banded_c":
            return banded_c
        cand = (banded_c.join(F.broadcast(banded_b), ["band", "bucket"])
                .select("corpus_id", "bench_id").dropDuplicates())
        if upto == "cand":
            return cand
        if cut == "lazy":
            cand = lineage_cut(cand, eager=False, serialized=True)
        cand_ids = cand.select("corpus_id").dropDuplicates()
        sh_c = base_c.join(F.broadcast(cand_ids), "corpus_id", "left_semi").select(
            "corpus_id", D._hashed_shingles(F.col("_t"), 5).alias("_sh_a"))
        sh_b = base_b.select(
            "bench_id", D._hashed_shingles(F.col("_t"), 5).alias("_sh_b"))
        return (cand.join(sh_c, "corpus_id").join(F.broadcast(sh_b), "bench_id")
                .select("corpus_id", "bench_id",
                        F.round(D._jaccard("_sh_a", "_sh_b"), 6).alias("jaccard"))
                .where(F.col("jaccard") >= 0.5))

    t("1 sig_c", lambda: build("sig_c"))
    t("2 sig_b (bench side only)", lambda: build("sig_b"))
    t("3 banded_c", lambda: build("banded_c"))
    t("4 cand (join+dropDup, no cut)", lambda: build("cand"))
    t("5 full, lazy cut (current)", lambda: build("full"))
    t("6 full, NO cut", lambda: build("full", cut="none"))
    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    t("7 entry q_prep_decontaminate", lambda: qs["q_prep_decontaminate"](spark, sf_dir))
    t("8 entry q_e2_minhash_neardup", lambda: qs["q_e2_minhash_neardup"](spark, sf_dir))
    t("9 entry q_e2_neardup_recall", lambda: qs["q_e2_neardup_recall"](spark, sf_dir))


if __name__ == "__main__":
    main()
