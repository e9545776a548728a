"""Structured Streaming surface (E11).

The reference had no streaming, but its batch-audit pattern — allocate a
batch_id, stamp it on every row, process per-batch (SURVEY.md §1.3) — is
literally Structured Streaming's ``foreachBatch(df, batch_id)`` contract,
so the streaming sink below reuses the same lake layout: each micro-batch
lands as a ``batch_id=N`` partition with an audit row, and the batch
pipeline's readers work unchanged on streamed data.

Watermarks bound state for late data; windowed aggs reuse the same
``window()``/``session_window()`` expressions as the batch operators
(operators/events.py) — one definition, two execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineer_spark.schemas import EVENTS_RAW


def stream_events(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over an events directory (parquet). In deployment

    the source swaps for kafka/kinesis — the downstream plan is identical.
    ``ts`` is normalized to a µs TimestampType column whatever the file's
    native precision (same policy as testdata.load_table): a one-time batch
    footer probe decides whether the column arrives as a timestamp (µs
    file) or must be read as an ns-long and floored."""
    import os

    from pyspark.errors.exceptions.captured import AnalysisException
    from pyspark.sql import types as T

    from dataengineer_spark.schemas import EVENTS

    # naive µs files are interpreted as UTC wall clock, like load_table
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # probe the footer with a batch read: stream schemas are mandatory and
    # fixed up-front, so sniff which shape this lake uses before subscribing
    ts_is_native = False
    try:
        dt = spark.read.parquet(path).schema["ts"].dataType
        ts_is_native = isinstance(dt, (T.TimestampType, T.TimestampNTZType))
    except AnalysisException:
        pass  # ns file in a vanilla session: read as long below

    schema = EVENTS if ts_is_native else EVENTS_RAW
    reader = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    if path.endswith(".parquet") and os.path.isfile(path):
        # file streams need a directory; narrow the listing to the one file
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    raw = reader.parquet(path)
    if ts_is_native:
        return raw
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def windowed_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding counts per event_type."""
    win = (
        F.window("ts", window) if slide is None else F.window("ts", window, slide)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionized_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Per-user gap sessions on the stream (state bounded by watermark)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("session_value"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def stateful_running_totals(
    events: DataFrame, key_col: str = "event_type", value_col: str = "value"
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-key

    running (count, sum) carried across micro-batches in explicit group
    state — the E11 surface for operators that windowed aggs can't express
    (counters, custom sessionization, online sketches). State is one fixed
    (long, double) tuple per key: bounded by key cardinality, not data
    volume — safe at 100 TB input. Emits the updated running totals for
    every key seen in the current micro-batch (update semantics).
    """
    import pandas as pd  # noqa: F811 — executor-side import
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n": [n], "total_value": [total]})

    # derive the key field's type from the input schema so non-string
    # keys (e.g. user_id long) work — same rule as
    # stream_trailing_anomalies
    key_sql_type = events.schema[key_col].dataType.simpleString()
    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} {key_sql_type}, n long, total_value double"
        ),
        stateStructType="n long, total_value double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: right-side events within
    ``within`` after a left-side event for the same key. Both watermarks
    plus the time-interval condition bound the join state Spark must
    retain — without them a stream-stream join buffers forever. Inner
    join results emit as soon as both sides arrive (no watermark wait).
    """
    l = left.withWatermark("ts", watermark).select(
        F.col(key).alias("l_key"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_id"),
    )
    r = right.withWatermark("ts", watermark).select(
        F.col(key).alias("r_key"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_id"),
        F.col("value").alias("r_value"),
    )
    return l.join(
        r,
        F.expr(
            f"l_key = r_key AND r_ts BETWEEN l_ts AND l_ts + INTERVAL {within}"
        ),
    )


def batch_audited_sink(
    stream: DataFrame,
    catalog,
    table: str,
    pipeline_name: str = "stream",
    checkpoint: str | None = None,
    trigger_once: bool = True,
):
    """foreachBatch sink that writes each micro-batch through the engine's

    batch-audit lineage: stamp the epoch-derived batch_id, append the audit
    row, write the partition. Exactly the reference's per-batch pattern
    (SURVEY.md E11 note) with streaming semantics.

    ``checkpoint`` is REQUIRED: epoch ids are monotonic only within one
    checkpoint lineage — without it every run restarts at epoch 0 and
    re-stamps batch_id=0 into the shared audit table, silently merging
    unrelated micro-batches under one id.  batch_id uniqueness is scoped
    to the checkpoint; point different pipelines (or a reset) at
    different audit tables or id ranges.
    """
    from dataengineer_spark.batch import AUDIT_TABLE, stamp_batch
    from dataengineer_spark import schemas as S

    if not checkpoint:
        raise ValueError(
            "batch_audited_sink: checkpoint is required — epoch-derived "
            "batch_ids restart at 0 without one, corrupting audit lineage"
        )

    def sink(df: DataFrame, epoch_id: int) -> None:
        spark = df.sparkSession
        stamped = stamp_batch(df, epoch_id)
        catalog.write(stamped, table)
        audit = spark.createDataFrame(
            [(int(epoch_id), pipeline_name, None, None, f"stream epoch {epoch_id}")],
            schema=S.BATCH,
        )
        catalog.write(audit, AUDIT_TABLE)

    writer = stream.writeStream.foreachBatch(sink).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup(
    events: DataFrame,
    key_cols: list[str] | None = None,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` holds a key's fingerprint only until
    the watermark passes it, so state size follows the late-data horizon,
    not stream lifetime — plain ``dropDuplicates`` on an unbounded stream
    grows state forever and is a cluster-killer. The batch twin is
    operators.dedup.exact_dedup / incremental_dedup (same key semantics,
    lake-table fingerprint store instead of operator state).
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols or ["event_id"]
    )


def stream_documents(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over a documents parquet (schema-first, like
    ``stream_events``); in deployment the source swaps for kafka/kinesis
    with the same downstream plan."""
    import os

    reader = spark.readStream.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).option("maxFilesPerTrigger", 1)
    if path.endswith(".parquet") and os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return reader.parquet(path)


def stream_contamination(
    docs: DataFrame,
    bench_gram_set: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming benchmark-contamination audit — decontaminate AS DATA
    LANDS instead of in a batch sweep. Per streamed document: build its
    word n-grams IN-ROW, intersect with the broadcast benchmark gram set,
    emit (id, n_grams, n_hits, contaminated).

    ``bench_gram_set`` is a ONE-ROW static DataFrame whose single
    array<string> column — named ``_bg`` — holds the distinct benchmark
    grams (build it with
    ``bench.agg(F.collect_set(gram).alias("_bg"))``; any other column
    name raises here rather than at stream runtime).  Eval suites are
    dimension-sized next to a 100 TB corpus — same broadcast contract as
    the batch ``ngram_overlap`` and ``minhash_lsh_join``.  The join is
    stream-static on a constant key with a broadcast build side, so the
    query is MAP-ONLY: no state store, no watermark, append mode —
    per-event cost is O(doc grams + |benchmark grams|) regardless of
    stream lifetime (the intersect pays one hash-set pass over the
    broadcast gram array PER ROW, so the operator's contract is a
    dimension-sized benchmark, ≲10⁴ grams — the round-9 sf10 probe
    priced a 40k-gram benchmark at 2×10¹¹ set ops over 5 M docs; for
    benchmark suites past the bound use the foreachBatch explode-join
    pattern of ``stream_neardup_filter`` instead).  Batch twin:
    ``preparation.ngram_overlap`` (same gram builder, same counts).
    """
    from dataengineer_spark.operators.preparation import word_ngrams

    if "_bg" not in bench_gram_set.columns:
        raise ValueError(
            "stream_contamination: bench_gram_set must carry the gram "
            "array in a column named '_bg' (use collect_set(...)"
            ".alias('_bg')); got columns "
            f"{bench_gram_set.columns}"
        )
    from dataengineer_spark.tuning import fan_out_stream

    grams = word_ngrams(F.col(text_col), n)
    static = F.broadcast(bench_gram_set.withColumn("_k", F.lit(1)))
    return (
        # gram build + per-row intersect is the CPU; a file micro-batch
        # is one partition per file and would serialize it (fan_out_stream
        # docstring: measured 7× at sf0.1)
        fan_out_stream(docs).select(F.col(id_col), grams.alias("_grams"))
        .withColumn("_k", F.lit(1))
        .join(static, "_k")
        .withColumn(
            "n_hits", F.size(F.array_intersect("_grams", "_bg")).cast("bigint")
        )
        .select(
            id_col,
            F.size("_grams").alias("n_grams"),
            "n_hits",
            (F.col("n_hits") > 0).alias("contaminated"),
        )
    )


def windowed_distinct_approx(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    col: str = "user_id",
    rsd: float = 0.05,
) -> DataFrame:
    """Watermarked windowed approximate distinct (HLL++): the streaming

    unique-users metric.  Exact streaming distinct would hold every seen
    key per open window in the state store; the HLL register array is
    fixed-size per (window, event_type) whatever the cardinality — the
    only distinct the state store can afford on an unbounded stream.
    Same expression works in batch (operators/aggregates) — one
    definition, two execution modes.

    The input is fanned to session parallelism first (``fan_out_stream``):
    HLL register building happens in the PARTIAL aggregate, which runs on
    the source partitioning — one partition per file on a file
    micro-batch, serializing the sketch work before the window exchange
    ever distributes it."""
    from dataengineer_spark.tuning import fan_out_stream

    return (
        fan_out_stream(events).withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.approx_count_distinct(col, rsd).alias("approx_users"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "approx_users",
        )
    )


def stream_trailing_anomalies(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    lookback: int = 20,
    z_threshold: float = 3.0,
    min_history: int = 5,
) -> DataFrame:
    """ONLINE trailing-window anomaly detection — the streaming twin of

    ``events.trailing_anomalies``: per-key state is a bounded deque of
    the last ``lookback`` observations carried across micro-batches
    (``applyInPandasWithState``; state size O(lookback) per key, never
    data volume), and every arriving event scores against the PRECEDING
    window only.

    Engine-parity contract: observations quantize to milli-unit
    integers (round-half-away, the SQL ``round(x*1000, 0)`` rule), so
    window sums stay exact integers below 2^53 and the z-score is the
    same IEEE double on any engine, partitioning, or micro-batch
    boundary — the batch SQL oracle replays the identical float
    sequence.  z is scale-invariant, so milli-unit z == raw-unit z.
    """
    import math

    import pandas as pd  # noqa: F811 — executor-side import
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def quantize(x: float) -> int:
        return int(math.copysign(math.floor(abs(x) * 1000.0 + 0.5), x))

    def round_away(x: float, digits: int = 6) -> float:
        # SQL round() is half-away-from-zero; Python round() is half-even
        scale = 10.0 ** digits
        return math.copysign(math.floor(abs(x) * scale + 0.5), x) / scale

    def update(key, pdfs, state: GroupState):
        hist: list[int] = list(state.get[0]) if state.exists else []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values([ts_col, id_col], kind="mergesort")
        out_ts, out_v, out_z, out_flag = [], [], [], []
        for ts, v in zip(batch[ts_col], batch[value_col]):
            if v is None or (isinstance(v, float) and math.isnan(v)):
                # NULL observation: no score, and it never enters the
                # window — mirrors the batch twin, whose frame sums
                # ignore NULLs (quantize(NaN) would crash the query)
                out_ts.append(ts)
                out_v.append(None)
                out_z.append(None)
                out_flag.append(False)
                continue
            mv = quantize(float(v))
            n = len(hist)
            z_raw = None
            if n >= min_history:
                s1 = sum(hist)
                s2 = sum(h * h for h in hist)
                var = (s2 - s1 * s1 / n) / (n - 1)
                if var > 0:
                    z_raw = (mv - s1 / n) / math.sqrt(var)
            out_ts.append(ts)
            out_v.append(float(v))
            out_z.append(None if z_raw is None else round_away(z_raw))
            out_flag.append(bool(z_raw is not None and abs(z_raw) > z_threshold))
            hist.append(mv)
            if len(hist) > lookback:
                hist = hist[-lookback:]
        state.update((hist,))
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(out_ts),
                ts_col: out_ts,
                value_col: out_v,
                "z_score": out_z,
                "is_anomaly": out_flag,
            }
        )

    # derive the key field's type from the input schema so non-long keys
    # (e.g. string user ids) work — the rest of the output is fixed-typed
    key_sql_type = events.schema[key_col].dataType.simpleString()
    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} {key_sql_type}, {ts_col} timestamp, "
            f"{value_col} double, z_score double, is_anomaly boolean"
        ),
        stateStructType="hist array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_neardup_filter(
    stream: DataFrame,
    seen_bands: DataFrame,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    portable: bool = False,
    checkpoint: str | None = None,
    engine: str = "expr",
):
    """Near-dup-filtered ingest — the streaming twin of

    ``dedup.incremental_neardup``: every micro-batch probes the STORED
    ``signature_table`` index (a static DataFrame; at deployment the
    lake table, re-read per batch if it grows) and only surviving rows
    are appended to ``out_path``.  The index is FIXED for the run, so
    results are micro-batch-split-invariant — stream and batch agree
    row-for-row, which is what lets the batch SQL oracle check the
    streamed output.  State store: none (the index IS the state, in the
    lake where it belongs — per-key operator state would grow with
    corpus lifetime).

    foreachBatch (the reference's own per-batch contract) rather than a
    stream-stream anti join: the flag is an EXISTS over the band rows of
    each document, which Structured Streaming cannot express without
    stateful aggregation, while per-batch it is the ordinary two-join
    batch plan.

    ``checkpoint`` is REQUIRED: the sink appends to ``out_path``, so a
    checkpoint-less rerun would reprocess the whole source and write
    every kept row twice.
    """
    if not checkpoint:
        raise ValueError(
            "stream_neardup_filter: checkpoint is required — a rerun "
            "without one reprocesses the whole source and appends "
            "duplicate rows to out_path (same lineage hazard as "
            "batch_audited_sink)"
        )

    from dataengineer_spark.operators.dedup import incremental_neardup

    def sink(df: DataFrame, epoch_id: int) -> None:
        kept = incremental_neardup(
            df, seen_bands, id_col, text_col, shingle_size, num_hashes,
            bands, portable=portable, engine=engine,
        )
        kept.write.mode("append").parquet(out_path)

    writer = (
        stream.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    return writer.trigger(availableNow=True).start()


def stream_neardup_ingest(
    stream: DataFrame,
    index_path: str,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    portable: bool = False,
    checkpoint: str | None = None,
    engine: str = "expr",
):
    """DEPLOY-form near-dup-filtered ingest (VERDICT r9 item 2) — unlike
    ``stream_neardup_filter``'s fixed-index probe, the signature index is
    MAINTAINED intra-run: each micro-batch's accepted docs append their
    band rows to the index lake table before the next batch probes it,
    so near-dups that are both NEW in the same run are caught.  The
    reference never reached streaming; this is the extension-surface
    completion of the lake-index pattern (`signature_table` →
    `incremental_neardup`) to a live ingest loop.

    Per micro-batch (all decisions signature-only; raw text shuffles
    zero times — the band rows are 24-byte):

    1. band the batch once (``signature_table``; one map-only pass);
    2. WITHIN-batch self-dedup: a doc is dropped when it shares a
       (band, bucket) with a SMALLER-``id_col`` doc in the same batch —
       greedy by id and deliberately NOT conditioned on the smaller
       doc's own survival (no transitive re-admission), which keeps the
       rule one windowed aggregate instead of an iterative collapse and
       makes results independent of partitioning;
    3. CROSS-batch probe: drop docs sharing any (band, bucket) with the
       index as of the previous batch (semi join on 24-byte rows —
       identical shape to ``incremental_neardup``);
    4. survivors append to ``out_path``; survivors' band rows append to
       ``index_path``.

    Semantics note: results DEPEND on the micro-batch split — two mutual
    near-dups in one batch keep the smaller id, across batches the
    earlier batch wins.  That is the deploy semantics (arrival order
    matters), so the batch oracle must replay the SAME split; callers
    that need split-invariance use ``stream_neardup_filter``.

    Failure/replay contract: a batch retried after a sink failure
    re-appends (same hazard as every foreachBatch appender, hence the
    required ``checkpoint``).  Duplicate rows in ``index_path`` are
    semantically harmless — band rows act as a set under the semi-join
    probe — so the index needs no transactional dedup; ``out_path``
    carries the usual at-least-once caveat.

    Scale shape: the index grows with ACCEPTED docs only (~24 bytes ×
    bands per doc).  Re-reading it per batch is one partition-pruned
    parquet scan of a bands-sized table; at deployment the append and
    the probe hit the same lake table the batch pipeline maintains, so
    stream and batch ingest share one index.  Seed the index by writing
    ``signature_table(history)`` to ``index_path`` before starting.
    """
    if not checkpoint:
        raise ValueError(
            "stream_neardup_ingest: checkpoint is required — a rerun "
            "without one reprocesses the whole source and appends "
            "duplicate rows to out_path"
        )

    from pyspark.sql import Window as W

    from dataengineer_spark.operators.dedup import signature_table

    def sink(df: DataFrame, epoch_id: int) -> None:
        spark = df.sparkSession
        bands_new = signature_table(
            df, id_col, text_col, shingle_size, num_hashes, bands,
            portable=portable, engine=engine,
        ).localCheckpoint()  # batch-sized; probed twice + appended below
        try:
            # self-dedup (rule 2): one window over the batch's band rows.
            # NULL buckets are excluded so the window keeps SQL-equality
            # semantics (a join on bucket never matches NULLs; a window
            # partition WOULD group them) — same zero-pair contract as
            # dedup.guard_bucket_quadratic
            w = W.partitionBy("band", "bucket")
            self_flag = (
                bands_new.where(F.col("bucket").isNotNull())
                .withColumn("_m", F.min(id_col).over(w))
                .where(F.col("_m") < F.col(id_col))
                .select(id_col)
            )
            # cross-batch probe (rule 3) against the index as of the
            # previous batch; first batch starts from the seed (or empty)
            try:
                idx = spark.read.parquet(index_path).select("band", "bucket")
                cross_flag = bands_new.join(
                    idx, ["band", "bucket"], "left_semi"
                ).select(id_col)
            except Exception:  # no index yet: nothing ingested or seeded
                cross_flag = self_flag.limit(0)
            dropped = self_flag.unionByName(cross_flag).dropDuplicates()
            kept = df.join(dropped, id_col, "left_anti")
            kept.write.mode("append").parquet(out_path)
            kept_bands = bands_new.join(
                dropped, id_col, "left_anti"
            )
            kept_bands.write.mode("append").parquet(index_path)
        finally:
            bands_new.unpersist()

    writer = (
        stream.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    return writer.trigger(availableNow=True).start()
