"""Streaming plans must produce the batch answers: same aggregations,
streaming vs batch over the same events parquet."""

from __future__ import annotations

from pyspark.sql import functions as F

from pmp_analytics_spark.operators.sessionize import sessionize_native
from pmp_analytics_spark.sources.reader import load_table
from pmp_analytics_spark.streaming import (
    read_event_stream,
    run_to_memory,
    streaming_event_type_counts,
    streaming_sessions,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_streaming_window_counts_match_batch(spark):
    stream = read_event_stream(spark, SF_DIR)
    run_to_memory(streaming_event_type_counts(stream), "stream_counts")
    got = spark.table("stream_counts")

    events = load_table(spark, SF_DIR, "events")
    expected = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("value_sum"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "value_sum")
    )
    cols = ["window_start", "event_type", "n_events", "value_sum"]
    assert _rows(got, cols) == _rows(expected, cols)
    assert got.count() > 0


def test_streaming_sessions_match_batch(spark):
    stream = read_event_stream(spark, SF_DIR)
    run_to_memory(streaming_sessions(stream, gap_seconds=1800), "stream_sessions")
    got = spark.table("stream_sessions")

    events = load_table(spark, SF_DIR, "events")
    expected = sessionize_native(events, gap_seconds=1800)
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert _rows(got, cols) == _rows(expected, cols)
    assert got.count() > 0
