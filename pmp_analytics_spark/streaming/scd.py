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
    the versioned SCD2 dimension at ``root`` via ``scd2_apply`` (see
    ``streaming/mv.py::cdc_apply_stream`` for the seeding/exactly-once
    contract)."""
    from pmp_analytics_spark.operators.scd import scd2_apply
    from pmp_analytics_spark.streaming.mv import cdc_apply_stream

    return cdc_apply_stream(
        delta_stream,
        root,
        lambda cur, batch: scd2_apply(
            cur, batch, keys, attr_cols, effective_ts
        ),
        checkpoint_dir=checkpoint_dir,
        keep_last=keep_last,
        publish_partitions=publish_partitions,
    )
