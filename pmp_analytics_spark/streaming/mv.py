"""Streaming materialized-view maintenance from a CDC feed.

The streaming form of ``operators/diff.py::incremental_mv_refresh``: a
change-data stream (``snapshot_delta`` rows — ``change_type`` +
``old_*``/``new_*`` columns) keeps a SUM/COUNT rollup current, one
micro-batch at a time, without ever rescanning the base table. Movement
per batch is O(|batch delta|) + one view-sized merge — the production
shape for keeping 100 TB rollups fresh off a changefeed.

Exactly-once: additive refresh is NOT idempotent (replaying a batch
double-applies it), so each publish carries the micro-batch id as the
``publish_versioned`` commit marker, written inside the immutable
version dir before the atomic ``_LATEST`` flip. A replayed batch finds
its own id (or a later one) already committed and skips — the pointer
flip is the transaction. The guard relies on Structured Streaming's
nondecreasing batch ids per checkpoint, so one state ``root`` must be
paired with ONE checkpoint lineage; resuming the same checkpoint (the
normal continue-the-feed path) extends ids monotonically.

Batch-boundary independence: refresh contributions are associative and
commutative sums, so ANY slicing of the delta into micro-batches yields
the same final view — pinned in tests against the single-shot batch
refresh and the full recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_MARKER_PREFIX = "batch:"


def batch_marker(batch_id: int) -> str:
    """Namespaced commit marker the streaming refresh loops write."""
    return f"{_MARKER_PREFIX}{batch_id}"


def parse_batch_marker(mk: str | None) -> int | None:
    """Committed batch id carried by a version marker, or None.

    ``publish_versioned`` accepts arbitrary marker strings, so the
    stream loops NAMESPACE theirs (``batch:<id>``) — a semantic marker
    someone else published (``v2024-01``, ``repair-1``) is not a batch
    commit and must neither crash the stream nor, worse, be MISREAD as
    one: a numeric-looking marker like ``20240101`` parsed naively
    would silently skip every batch ≤ 20240101. Plain integers are
    still accepted for roots published by pre-namespace versions of
    these loops (their lineage keeps its replay guard on resume).
    """
    if mk is None:
        return None
    if mk.startswith(_MARKER_PREFIX):
        try:
            return int(mk[len(_MARKER_PREFIX) :])
        except ValueError:
            return None
    try:  # legacy plain-int markers from earlier stream publishes
        return int(mk)
    except ValueError:
        return None  # someone else's semantic marker: not a commit


def cdc_mv_refresh_stream(
    delta_stream: DataFrame,
    root: str,
    group_cols: list[str],
    sum_cols: dict[str, str],
    count_col: str = "n_rows",
    checkpoint_dir: str | None = None,
    keep_last: int = 3,
    publish_partitions: int = 1,
):
    """Drain ``delta_stream`` (availableNow) applying each micro-batch to
    the versioned view state at ``root`` via ``incremental_mv_refresh``.

    The caller seeds ``root`` with the initial view (one
    ``publish_versioned(mv0, root)`` — no marker) before starting.
    Returns the terminated StreamingQuery.

    ``publish_partitions`` sizes each published version's file count: a
    rollup view is small by construction, and writing it through the
    session's full shuffle-partition count costs one file-create +
    footer per partition PER BATCH (measured 32-partition publishes
    dominated the demo query's wall). Raise it only for genuinely wide
    views.
    """
    from pmp_analytics_spark.operators.diff import incremental_mv_refresh
    from pmp_analytics_spark.sources.writers import (
        latest_marker,
        publish_versioned,
        read_latest,
    )

    spark = delta_stream.sparkSession

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        committed = parse_batch_marker(latest_marker(spark, root))
        if committed is not None and committed >= batch_id:
            return  # replayed batch: its effect is already committed
        if batch_df.isEmpty():
            # an empty delta is an identity refresh: publishing it would
            # rewrite the whole view and burn one keep_last slot of the
            # rollback horizon for nothing (its replay effect is nil, so
            # skipping the marker advance is also safe)
            return
        cur = read_latest(spark, root)
        new = incremental_mv_refresh(
            cur, batch_df, group_cols, sum_cols, count_col
        ).coalesce(publish_partitions)
        # the lazy read of the CURRENT version feeds the write of the
        # NEXT one; the old dir is immutable during the write and
        # survives keep_last pruning long past the read
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
