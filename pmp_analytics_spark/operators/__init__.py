from pmp_analytics_spark.operators import (
    agg,
    dedup,
    joins,
    partitioning,
    sample,
    sessionize,
    setops,
    similarity_search,
)

__all__ = [
    "agg",
    "dedup",
    "joins",
    "partitioning",
    "sample",
    "sessionize",
    "setops",
    "similarity_search",
]
