from pmp_analytics_spark.operators import (
    agg,
    dedup,
    joins,
    maintenance,
    partitioning,
    pipeline,
    quality,
    sample,
    sessionize,
    setops,
    similarity_search,
)

__all__ = [
    "agg",
    "dedup",
    "joins",
    "maintenance",
    "partitioning",
    "pipeline",
    "quality",
    "sample",
    "sessionize",
    "setops",
    "similarity_search",
]
