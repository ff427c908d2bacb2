"""Streaming Type-2 dimension maintenance from a CDC feed.

The streaming form of ``operators/scd.py::scd2_apply``, structured
exactly like ``streaming/mv.py`` (same versioned-publish state, same
exact-once marker protocol): each micro-batch of ``snapshot_delta``
rows closes the touched keys' current intervals and opens their new
ones, then the refreshed dimension publishes through the atomic
``_LATEST`` flip.

Exactly-once: re-applying a batch would DUPLICATE its opened intervals
(the close half is naturally idempotent — a closed row no longer
matches the current-row join — but the insert half is not), so each
publish carries the micro-batch id as the commit marker and replayed
batches skip. Batch-boundary independence: ``snapshot_delta`` emits
each key once, so any slicing into micro-batches touches disjoint keys
and applying them in any grouping yields the same dimension — pinned
in tests against the single-shot batch apply.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def cdc_scd2_stream(
    delta_stream: DataFrame,
    root: str,
    keys: list[str],
    attr_cols: list[str],
    effective_ts: Column,
    checkpoint_dir: str | None = None,
    keep_last: int = 3,
    publish_partitions: int = 1,
):
    """Drain ``delta_stream`` (availableNow) applying each micro-batch to
    the versioned SCD2 dimension at ``root`` via ``scd2_apply``. The
    caller seeds ``root`` with the initial dimension (one
    ``publish_versioned(dim0, root)`` — no marker) before starting.
    Returns the terminated StreamingQuery.
    """
    from pmp_analytics_spark.operators.scd import scd2_apply
    from pmp_analytics_spark.sources.writers import (
        latest_marker,
        publish_versioned,
        read_latest,
    )
    from pmp_analytics_spark.streaming.mv import batch_marker, parse_batch_marker

    spark = delta_stream.sparkSession

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        committed = parse_batch_marker(latest_marker(spark, root))
        if committed is not None and committed >= batch_id:
            return  # replayed batch: its effect is already committed
        if batch_df.isEmpty():
            return  # identity apply: don't burn a version slot
        cur = read_latest(spark, root)
        new = scd2_apply(
            cur, batch_df, keys, attr_cols, effective_ts
        ).coalesce(publish_partitions)
        publish_versioned(
            new, root, keep_last=keep_last, marker=batch_marker(batch_id)
        )

    writer = delta_stream.writeStream.foreachBatch(apply_batch).trigger(
        availableNow=True
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return q
