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
    ``min_partitions`` (default: the session's default parallelism).

    Apply to the NARROW INPUT of an expensive projection, not on top of
    it — a repartition above the projection runs the expensive compute on
    the shuffle's map side, i.e. still on the original splits."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def salted_agg(
    df: DataFrame,
    group_by: list[str],
    aggs: dict[str, tuple],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed keys: aggregate on (key, salt)
    first — spreading a hot key over ``salt_buckets`` reducers — then
    merge the partials on the key alone.

    ``aggs`` maps output name -> (partial_fn, merge_fn, input_col), e.g.
    ``{"n": (F.count, F.sum, F.lit(1)), "total": (F.sum, F.sum, "x")}``.
    Only works for decomposable aggregates (count/sum/min/max — the same
    restriction as any partial aggregation).

    AQE's skew-join handling covers JOIN skew at runtime; aggregation
    skew on a hot group key still funnels one reducer, which is what the
    salt fixes. At 100 TB the extra shuffle of small partials is noise
    next to a straggling reducer.
    """
    from pyspark.sql import functions as F

    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets)))
    partial = salted.groupBy(*group_by, "__salt").agg(
        *[fn(col).alias(f"__p_{name}") for name, (fn, _, col) in aggs.items()]
    )
    return partial.groupBy(*group_by).agg(
        *[merge(F.col(f"__p_{name}")).alias(name) for name, (_, merge, _) in aggs.items()]
    )
