from dataengineer_spark.streaming.pipeline import (
    stream_dedup,
    stream_events,
    windowed_counts,
    sessionized_stream,
    stateful_running_totals,
    batch_audited_sink,
    stream_stream_join,
    stream_documents,
    stream_contamination,
    stream_neardup_filter,
    windowed_distinct_approx,
    stream_trailing_anomalies,
)

__all__ = [
    "stream_dedup",
    "stream_events",
    "windowed_counts",
    "sessionized_stream",
    "stateful_running_totals",
    "batch_audited_sink",
    "stream_stream_join",
    "stream_documents",
    "stream_contamination",
    "stream_neardup_filter",
    "windowed_distinct_approx",
    "stream_trailing_anomalies",
]
