"""Scale probe for the live-ingest signature index (VERDICT r10 item 1).

Question: does the per-micro-batch index probe stay roughly flat as the
accepted history grows 10×?  The round-10 form re-read and re-SHUFFLED
the whole unpartitioned index per batch (O(history) per batch, growing
forever); the round-11 form probes a bucketed table with adaptive
bucket pruning and a broadcast-built join.  This tool measures all
three shapes at two index sizes:

- ``r11 pruned``  — bucketed scan + isin bucket pruning + broadcast
  build (what a small trigger batch runs);
- ``r11 unpruned`` — same join, no isin (what an over-threshold batch
  runs: still no shuffle/sort of the index, but a full scan);
- ``r10 legacy``  — plain parquet read of the same files + left-semi
  join (the shape this round replaced: the index side shuffles).

Usage:  python tools/probe_ingest_index.py [small_docs] [mult] [out.json]
Defaults: 1_000_000 docs small, 10× large, 8 bands/doc, 256 buckets,
batch = 16 docs (128 band rows → pruning engages).  Results land in
SCALE.md's round-11 row.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataengineer_spark.session import build_session  # noqa: E402
from dataengineer_spark.streaming.pipeline import (  # noqa: E402
    _cross_probe,
    seed_neardup_index,
)

BANDS = 8
N_BUCKETS = 256
BATCH_DOCS = 16
REPS = 7


def synth_bands(spark, n_docs: int, seed_tag: int):
    """Synthetic (doc_id, band, bucket) rows with hash-like bucket keys —
    probe cost depends on index size and layout, not on how signatures
    were computed, so synthesizing skips the (expensive, already
    sf10-probed) MinHash step."""
    return (
        spark.range(n_docs)
        .select(
            (F.col("id") + seed_tag).alias("doc_id"),
            F.explode(
                F.array(*[F.lit(b) for b in range(BANDS)])
            ).alias("band"),
        )
        .select(
            "doc_id",
            "band",
            F.concat_ws(
                ",",
                F.conv(
                    F.abs(F.xxhash64("doc_id", "band", F.lit(1))) % 999983,
                    10, 16,
                ),
                F.conv(
                    F.abs(F.xxhash64("doc_id", "band", F.lit(2))) % 999983,
                    10, 16,
                ),
            ).alias("bucket"),
        )
    )


def probe_walls(spark, index_path, batch_bands, n_index_buckets):
    """Median wall of REPS probe executions (each a fresh plan, as the
    sink builds one per epoch)."""
    abs_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prior = spark.conf.get(abs_key, "true")
    spark.conf.set(abs_key, "false")
    walls = []
    try:
        for _ in range(REPS):
            t0 = time.time()
            probe = _cross_probe(
                spark, index_path, batch_bands, 0, "doc_id",
                "xxhash64", n_index_buckets,
            )
            probe.write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
    finally:
        spark.conf.set(abs_key, prior)
    return round(statistics.median(walls), 3)


def legacy_walls(spark, index_path, batch_bands):
    """The round-10 probe shape: whole-index parquet read, left-semi join
    (index side exchanges)."""
    walls = []
    for _ in range(REPS):
        t0 = time.time()
        idx = spark.read.parquet(index_path).select("band", "bucket")
        flagged = batch_bands.join(idx, ["band", "bucket"], "left_semi").select(
            "doc_id"
        )
        flagged.write.format("noop").mode("overwrite").save()
        walls.append(time.time() - t0)
    return round(statistics.median(walls), 3)


def live_epochs(spark, root, seed_docs: int, n_epochs: int, docs_dir: str):
    """The literal N-batch form: drive the REAL per-epoch sink body
    (signature → self-dedup → probe → epoch overwrite → bucketed index
    append) batch after batch against a pre-seeded history, recording
    each epoch's full wall.  Flat walls against a 10×-bigger seed =
    the probe does not pay O(history) per batch."""
    from pyspark.sql import functions as F

    from dataengineer_spark.streaming.pipeline import _neardup_ingest_epoch

    index_path = os.path.join(root, f"live_index_{seed_docs}")
    out_path = os.path.join(root, f"live_out_{seed_docs}")
    seed_neardup_index(
        synth_bands(spark, seed_docs, 0), index_path, n_index_buckets=N_BUCKETS
    )
    docs = (
        spark.read.parquet(docs_dir)
        .select("doc_id", "text")
        .limit(BATCH_DOCS * n_epochs)
        .localCheckpoint()
    )
    walls = []
    for ep in range(n_epochs):
        batch = docs.where(
            (F.col("doc_id") % n_epochs) == ep
        ).limit(BATCH_DOCS).localCheckpoint()
        t0 = time.time()
        _neardup_ingest_epoch(
            batch, ep, index_path, out_path, "doc_id", "text",
            5, 32, 8, True, "expr", N_BUCKETS,
        )
        walls.append(round(time.time() - t0, 3))
        batch.unpersist()
    docs.unpersist()
    return walls


def main() -> int:
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out_json = sys.argv[3] if len(sys.argv) > 3 else None
    spark = build_session("probe_ingest_index")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    root = tempfile.mkdtemp(prefix="spark_graft_ingestprobe_")
    results = {"small_docs": small, "large_docs": small * mult,
               "bands_per_doc": BANDS, "n_buckets": N_BUCKETS,
               "batch_docs": BATCH_DOCS, "reps": REPS, "walls": {}}
    # batch: half re-crawls (collides with seeded ids), half novel
    batch = (
        synth_bands(spark, BATCH_DOCS // 2, 0)
        .unionByName(synth_bands(spark, BATCH_DOCS // 2, 10_000_000_000))
        .localCheckpoint()
    )
    try:
        for tag, n_docs in (("small", small), ("large", small * mult)):
            index_path = os.path.join(root, f"index_{tag}")
            t0 = time.time()
            seed_neardup_index(
                synth_bands(spark, n_docs, 0), index_path,
                n_index_buckets=N_BUCKETS,
            )
            build_s = round(time.time() - t0, 1)
            size_mb = round(
                sum(
                    os.path.getsize(os.path.join(r, f))
                    for r, _, fs in os.walk(index_path)
                    for f in fs
                ) / 1e6,
                1,
            )
            results["walls"][tag] = {
                "index_rows": n_docs * BANDS,
                "index_mb": size_mb,
                "seed_s": build_s,
                "r11_pruned_s": probe_walls(spark, index_path, batch, N_BUCKETS),
                "r11_unpruned_s": probe_walls(spark, index_path, batch, 0),
                "r10_legacy_s": legacy_walls(spark, index_path, batch),
            }
            print(f"{tag}: {results['walls'][tag]}", flush=True)
        s, l = results["walls"]["small"], results["walls"]["large"]
        results["pruned_growth_x"] = round(
            l["r11_pruned_s"] / max(s["r11_pruned_s"], 1e-9), 2
        )
        results["legacy_growth_x"] = round(
            l["r10_legacy_s"] / max(s["r10_legacy_s"], 1e-9), 2
        )
        # literal N-batch sequence through the real sink body, small vs
        # 10× seed — per-epoch medians should roughly match
        docs_dir = "/root/testdata/sf0.1/documents.parquet"
        n_epochs = 12
        for tag, n_docs in (("small", small), ("large", small * mult)):
            walls = live_epochs(spark, root, n_docs, n_epochs, docs_dir)
            results["walls"][tag]["live_epoch_walls_s"] = walls
            results["walls"][tag]["live_epoch_median_s"] = round(
                statistics.median(walls), 3
            )
            print(f"live {tag}: {walls}", flush=True)
        results["live_growth_x"] = round(
            results["walls"]["large"]["live_epoch_median_s"]
            / max(results["walls"]["small"]["live_epoch_median_s"], 1e-9),
            2,
        )
        print(json.dumps(results))
        if out_json:
            with open(out_json, "w") as fh:
                json.dump(results, fh, indent=1)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
