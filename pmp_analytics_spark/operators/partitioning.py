"""Partitioning utilities for CPU-bound narrow stages.

A small parquet file scans as ONE input split, so an expensive per-row
expression chain (MinHash over shingles, a pandas UDF) runs on one core no
matter how many the cluster has. ``ensure_parallelism`` round-robins the
rows across at least ``defaultParallelism`` partitions first.

At 100 TB this is a no-op by construction: the scan already yields
thousands of splits (>= the check), so no shuffle is added. It only
triggers where it is needed — inputs whose split count is below the
cluster's core count, where the one-time small shuffle is strictly cheaper
than leaving cores idle through the expensive stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` iff its current partition count is below
    ``min_partitions`` (default: the session's default parallelism)."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
