"""100× streaming probe (round 9): does ``fan_out_stream`` hold at 5 M
docs, and what does the un-fanned plan cost there?

Runs the stream-decontamination audit (``stream_contamination`` — the
map-only stream-static gram intersect) over the sf10 documents table
(5 M fresh-content docs, tools/gen_sf10.py) as an availableNow stream,
twice: with the production ``fan_out_stream`` repartition, and with it
monkeypatched to identity (the pre-round-9 shape).  The source is one
parquet file, so every micro-batch is ONE partition without the fan-out
— the probe quantifies exactly what that serialization costs two
decades above bench scale.  The benchmark side is kept at the sf0.1
PROPORTIONS in absolute terms (~50 docs ≈ 4k grams): the map-only
intersect's per-row cost is O(|benchmark grams|) — each streamed row
pays one hash-set pass over the broadcast gram array — so the operator's
contract is a dimension-sized benchmark (≲10⁴ grams).  A first probe
parameterized at ~500 bench docs (~40k grams) priced 5M × 40k ≈ 2×10¹¹
set operations and was killed: for benchmark suites past the bound, the
scale form is the foreachBatch explode-join (``stream_neardup_filter``'s
pattern), not the per-row array intersect.

Usage: python tools/stream_probe_sf10.py [sf10_dir]
"""

from __future__ import annotations

import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF10 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10"


def main() -> None:
    from pyspark.sql import functions as F

    from dataengineer_spark import streaming as S
    from dataengineer_spark.operators.preparation import word_ngrams
    from dataengineer_spark.session import build_session
    from dataengineer_spark import tuning

    spark = build_session("stream_probe_sf10")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    docs = spark.read.parquet(f"{SF10}/documents.parquet")
    n_docs = docs.count()
    bench = (
        docs.where(F.col("doc_id") % 100_003 == 0)
        .select(F.explode(word_ngrams(F.col("text"), 8)).alias("_g"))
        .dropDuplicates()
        .agg(F.collect_set("_g").alias("_bg"))
    )
    n_grams = bench.select(F.size("_bg")).first()[0]
    print(f"docs={n_docs} bench_grams={n_grams}", flush=True)

    def run(tag: str) -> None:
        s = S.stream_documents(spark, f"{SF10}/documents.parquet")
        out = S.stream_contamination(s, bench, n=8)
        name = f"probe_{uuid.uuid4().hex[:8]}"
        t0 = time.time()
        q = (
            out.writeStream.outputMode("append")
            .format("noop")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.time() - t0
        print(f"{tag}: {wall:.1f} s  ({n_docs / wall:,.0f} docs/s)", flush=True)

    run("fanned (production)")

    real = tuning.fan_out_stream
    tuning.fan_out_stream = lambda df, min_partitions=None: df
    try:
        run("un-fanned (pre-r9 shape)")
    finally:
        tuning.fan_out_stream = real

    spark.stop()


if __name__ == "__main__":
    main()
