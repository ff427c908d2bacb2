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


def stream_workdir(name: str) -> str:
    """Fresh working directory for a demo streaming query, under one
    fixed per-query parent: the parent is PURGED first (the backstop for
    crashed runs, whose dirs would otherwise leak until the next
    invocation), then a unique dir is created inside it. Callers remove
    their dir on success (after localCheckpoint-ing anything they
    return); the shared definition keeps the crashed-run semantics in
    one place instead of seven."""
    parent = os.path.join(tempfile.gettempdir(), name)
    if os.path.isdir(parent):
        shutil.rmtree(parent, ignore_errors=True)
    os.makedirs(parent, exist_ok=True)
    return tempfile.mkdtemp(dir=parent)
