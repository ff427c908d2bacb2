"""Event sessionization — batch (gaps-and-islands) and the session-window op.

Not in the reference (its cadence is cron-batch; SURVEY.md §2.10) — this is
extension surface for the events stream table. Two equivalent batch
implementations:

- ``sessionize``: classic gaps-and-islands — lag(ts) over (user),
  new-session flag when gap > timeout, running sum → session id, then one
  groupBy. Two shuffles (window partition + groupBy), both keyed by user —
  Catalyst reuses the hash partitioning, and per-user data is tiny, so this
  scales by user cardinality, not event count. ANSI-SQL-expressible →
  DuckDB oracle.
- ``sessionize_native``: Spark's built-in ``session_window`` aggregation
  (one shuffle) — same results, used by the streaming pipeline in
  ``streaming/sessions.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-user sessions: id, start, end, event count, duration seconds."""
    # Gap arithmetic in exact integer microseconds (unix_micros), never in
    # floor-seconds — a gap within 1s of the threshold must not flip the
    # session split depending on sub-second truncation.
    w = Window.partitionBy(user_col).orderBy(ts_col)
    us = F.unix_micros(F.col(ts_col))
    flagged = events.withColumn(
        "__new_session",
        F.when(
            F.lag(ts_col).over(w).isNull()
            | (us - F.unix_micros(F.lag(ts_col).over(w)) > gap_seconds * 1_000_000),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("session_seq", F.sum("__new_session").over(w))
    return flagged.groupBy(user_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))).alias("duration_us"),
    )


def sessionize_native(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Same semantics via ``F.session_window`` (single shuffle; also the
    streaming-compatible form)."""
    gap = f"{gap_seconds} seconds"
    return (
        events.groupBy(user_col, F.session_window(F.col(ts_col), gap).alias("w"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("w")
    )
