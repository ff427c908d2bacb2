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
    "streaming_event_type_counts",
    "streaming_sessions",
    "view_purchase_pairs",
]
