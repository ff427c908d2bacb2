import os
import shutil
import tempfile

from pmp_analytics_spark.streaming.ingest import neardup_ingest_stream
from pmp_analytics_spark.streaming.joins import view_purchase_pairs
from pmp_analytics_spark.streaming.mv import cdc_mv_refresh_stream
from pmp_analytics_spark.streaming.sessions import (
    read_event_stream,
    run_to_memory,
    streaming_event_type_counts,
    streaming_sessions,
)

__all__ = [
    "cdc_mv_refresh_stream",
    "neardup_ingest_stream",
    "read_event_stream",
    "run_to_memory",
    "stream_workdir",
    "streaming_event_type_counts",
    "streaming_sessions",
    "view_purchase_pairs",
]


_STALE_WORKDIR_SECONDS = 3600.0


def stream_workdir(name: str) -> str:
    """Fresh working directory for a demo streaming query, under one
    fixed per-query parent. Only STALE children (mtime older than an
    hour — crashed runs, whose dirs would otherwise leak forever) are
    purged; a concurrent invocation of the same query (overlapping
    bench/correctness runs on one host) therefore never loses its live
    checkpoint/state dirs mid-stream. Callers remove their own dir on
    success (after localCheckpoint-ing anything they return); the
    shared definition keeps the crashed-run semantics in one place
    instead of seven."""
    import time

    parent = os.path.join(tempfile.gettempdir(), name)
    os.makedirs(parent, exist_ok=True)
    cutoff = time.time() - _STALE_WORKDIR_SECONDS
    for child in os.listdir(parent):
        path = os.path.join(parent, child)
        try:
            if os.path.getmtime(path) < cutoff:
                shutil.rmtree(path, ignore_errors=True)
        except OSError:
            pass  # raced with a concurrent cleanup; nothing to do
    return tempfile.mkdtemp(dir=parent)
