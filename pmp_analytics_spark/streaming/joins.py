"""Stream-stream joins (Structured Streaming extension surface).

The reference has no streaming at all (SURVEY.md §2.10); this is the
engine's incremental-join path: correlate two live event streams —
view→purchase conversion attribution — with event-time bounds.

Why the time bound is mandatory: an unbounded stream-stream inner join
would need infinite state (every past view kept forever waiting for a
future purchase). The interval condition ``purchase_ts ∈ [view_ts,
view_ts + max_lag]`` plus watermarks on BOTH sides lets Spark evict a
view's state once the watermark passes ``view_ts + max_lag`` — state is
bounded by (rate × lag window), which is what makes this runnable
against an unbounded source. An inner interval join emits exactly the
rows the equivalent batch join emits (no row depends on stream end), so
the batch SQL oracle is a complete check of the streaming plan.

Scale: state size per key is O(events within max_lag), sharded by the
join key across executors — the shuffle is on user_id, same as batch.
Skewed hot users would shard into the same state store partition; the
mitigation at 100 TB is the same salting used for batch skew
(operators/partitioning.py) applied to the bucket id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def view_purchase_pairs(
    views: DataFrame,
    purchases: DataFrame,
    max_lag_minutes: int = 240,
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner interval join: every (view, purchase) of the same user with
    the purchase at or after the view and within ``max_lag_minutes``.

    Both inputs may be streaming or batch DataFrames with (user_id, ts,
    event_id) — the identical plan compiles either way, which is how the
    batch==streaming equivalence test works.
    """
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    if views.isStreaming:
        v = v.withWatermark("view_ts", watermark)
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {max_lag_minutes} MINUTES")
        )
    )
    return v.join(p, cond, "inner").select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        "view_ts",
        "purchase_ts",
        (F.unix_micros("purchase_ts") - F.unix_micros("view_ts")).alias("lag_us"),
    )


def segment_windowed_counts(
    events: DataFrame,
    customers: DataFrame,
    window: str = "6 hours",
    watermark: str = "2 hours",
) -> DataFrame:
    """STREAM-STATIC join + windowed aggregation: enrich the event stream
    with a dimension table (user → market segment), then tumbling-window
    counts per segment.

    The static side needs no watermark and holds NO streaming state — each
    micro-batch plans a fresh broadcast-hash join against the dim exactly
    as a batch query would, which is the standard deployment shape for
    slowly-changing dimensions (the dim is re-read per batch, so an
    updated dim file takes effect on the next micro-batch). Unmatched
    events keep flowing via the left join with a sentinel segment, so a
    dim gap never silently drops stream rows.
    """
    dim = customers.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    enriched = events.join(F.broadcast(dim), on="user_id", how="left").withColumn(
        "segment", F.coalesce("segment", F.lit("UNKNOWN"))
    )
    if events.isStreaming:
        enriched = enriched.withWatermark("ts", watermark)
    return (
        enriched.groupBy(F.window("ts", window).alias("w"), "segment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
        .select(F.col("w.start").alias("window_start"), "segment", "n_events", "value_sum")
    )
