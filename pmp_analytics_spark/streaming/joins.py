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
