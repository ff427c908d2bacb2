"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``pmp_analytics_spark/`` — see
``pmp_analytics_spark/queries/`` for the declared query registry
(reference-parity pack + LLM-pipeline pack).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pmp_analytics_spark.queries import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The delinquency-notices pipeline — the reference's richest relational
    shape (delinquent_data_submitters.py:24-107): 3 normalized sources,
    filter with null/empty disjunction, left + inner + anti join, array
    assembly projection.
    """
    from pmp_analytics_spark.queries.parity import delinquency_notices

    return delinquency_notices(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (same column aliases)."""
    return all_oracles()
