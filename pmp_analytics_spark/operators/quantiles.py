"""Exact distributed percentiles without a global sort.

``ORDER BY v`` + rank picking is the textbook percentile, and at 100 TB
it is also the textbook disaster: a total sort range-shuffles the whole
column, and the rank probe then lands on one reducer.  The two-pass
bucket-locate / rank-within-bucket scheme here computes the EXACT
percentile value with two narrow scans and no total order:

  pass 1  equi-width histogram of the column (map-side partial counts,
          <= ``bins`` rows cross the exchange per partition) + the
          cumulative profile over that <= bins-row frame (broadcast
          triangle join, same idiom as sketches.histogram_quantiles);
  locate  for each requested quantile, the integer target rank
          ``ceil(num*n/den)`` (exact integer arithmetic, never a float
          boundary) falls in exactly one bucket; its in-bucket local
          rank is ``rank - cum_before``;
  pass 2  re-scan filtered to the target buckets only (predicate on the
          bucket expression, ~n/bins rows per quantile), rank inside
          each bucket with a window PARTITIONED BY quantile (parallel
          across quantiles, each partition bucket-sized), pick the row
          at the local rank.

The picked VALUE is exactly the order statistic at rank ceil(q*n) —
``percentile_disc`` semantics — so the oracle can state the answer with
an explicit ROW_NUMBER over the sorted column and the same integer
rank arithmetic.  Determinism: ties inside a bucket order arbitrarily,
but the value at a fixed rank of a multiset is unique, so the output is
partitioning- and tie-order-independent.

Skew note: an adversarial column where >> n/bins values collide into
one bucket (massive duplicates) degrades pass 2 to that bucket's size;
duplicates collapse to one rank-window partition but the VALUE is then
a constant run, so real deployments cap it with a recursion the repo
doesn't need at its scales (documented, not hidden).

Published basis: the classic external selection refinement (Munro &
Paterson 1980 multi-pass selection); reference parity anchor: the
reference's describe()/percentile summaries (techs.py), exact here at
scales where its single-node sort cannot run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bin_col(v: F.Column, mn: F.Column, mx: F.Column, bins: int) -> F.Column:
    """Equi-width bucket index in [0, bins): identical expression in both
    passes so locate and re-scan agree bit-for-bit."""
    return (
        F.when(mx == mn, F.lit(0))
        .otherwise(
            F.least(F.floor((v - mn) / (mx - mn) * bins), F.lit(bins - 1))
        )
        .cast("long")
    )


def exact_percentiles(
    df: DataFrame,
    value_col: str,
    qs: list[tuple[int, int]],
    bins: int = 512,
) -> DataFrame:
    """Exact order statistics at ranks ``ceil(num*n/den)`` for each
    ``(num, den)`` in ``qs``: output ``(q, value)``, q = num/den as
    double, value the exact column value at that rank."""
    vals = df.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("double").alias("v")
    )
    bounds = vals.agg(
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )

    binned = vals.crossJoin(F.broadcast(bounds)).select(
        "v", _bin_col(F.col("v"), F.col("mn"), F.col("mx"), bins).alias("bin")
    )
    bin_counts = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt"))
    b2 = bin_counts.select(
        F.col("bin").alias("b2"), F.col("cnt").alias("c2")
    )
    cum = (
        bin_counts.join(F.broadcast(b2), F.col("b2") <= F.col("bin"))
        .groupBy("bin", "cnt")
        .agg(F.sum("c2").alias("cum"))
    )

    from pmp_analytics_spark.sources.local import local_df

    spark = df.sparkSession
    qdf = local_df(
        spark, [(int(num), int(den)) for num, den in qs], "num long, den long"
    )
    # ceil(num*n/den) in pure BIGINT arithmetic (`div` is integer
    # division): no float boundary can ever move a rank.
    targets = qdf.crossJoin(F.broadcast(bounds)).select(
        "num",
        "den",
        F.greatest(
            F.expr("(num * n + den - 1) div den"), F.lit(1).cast("long")
        ).alias("rank"),
    )

    spec = (
        targets.join(F.broadcast(cum), F.col("cum") >= F.col("rank"))
        .groupBy("num", "den", "rank")
        .agg(F.min("bin").alias("bin"))
        .join(F.broadcast(cum), "bin")
        .select(
            "num",
            "den",
            "bin",
            (F.col("rank") - (F.col("cum") - F.col("cnt"))).alias("local_rank"),
        )
    )

    hits = binned.join(F.broadcast(spec), "bin")
    w = Window.partitionBy("num", "den").orderBy("v")
    picked = hits.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == F.col("local_rank")
    )
    return picked.select(
        (F.col("num").cast("double") / F.col("den")).alias("q"),
        F.col("v").alias("value"),
    )


def exact_group_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: list[tuple[int, int]],
    bins: int = 512,
) -> DataFrame:
    """Per-group exact order statistics — ``exact_percentiles`` with the
    histogram, cumulative profile, rank targets, and rescan all keyed by
    the group: output ``(group, q, value)``.

    Same two-pass shape and the same exactness argument as the global
    operator; every frame that was 1-row/bins-row there is G-row/
    G*bins-row here and still broadcasts (the operator targets
    reducer-friendly group cardinalities — segments, priorities, days;
    a billion-group percentile wants the sketch path in
    operators/sketches.py instead, and the broadcast makes that
    boundary explicit rather than silently shuffling)."""
    g = F.col(group_col).alias("g")
    vals = df.where(F.col(value_col).isNotNull()).select(
        g, F.col(value_col).cast("double").alias("v")
    )
    bounds = vals.groupBy("g").agg(
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )

    binned = vals.join(F.broadcast(bounds), "g").select(
        "g", "v", _bin_col(F.col("v"), F.col("mn"), F.col("mx"), bins).alias("bin")
    )
    bin_counts = binned.groupBy("g", "bin").agg(F.count(F.lit(1)).alias("cnt"))
    b2 = bin_counts.select(
        F.col("g").alias("g2"), F.col("bin").alias("b2"), F.col("cnt").alias("c2")
    )
    cum = (
        bin_counts.join(
            F.broadcast(b2),
            (F.col("g2") == F.col("g")) & (F.col("b2") <= F.col("bin")),
        )
        .groupBy("g", "bin", "cnt")
        .agg(F.sum("c2").alias("cum"))
    )

    from pmp_analytics_spark.sources.local import local_df

    spark = df.sparkSession
    qdf = local_df(
        spark, [(int(num), int(den)) for num, den in qs], "num long, den long"
    )
    targets = qdf.crossJoin(F.broadcast(bounds)).select(
        "g",
        "num",
        "den",
        F.greatest(
            F.expr("(num * n + den - 1) div den"), F.lit(1).cast("long")
        ).alias("rank"),
    )
    spec = (
        targets.join(
            F.broadcast(cum),
            (targets["g"] == cum["g"]) & (F.col("cum") >= F.col("rank")),
        )
        .drop(cum["g"])
        .groupBy("g", "num", "den", "rank")
        .agg(F.min("bin").alias("bin"))
        .join(F.broadcast(cum), ["g", "bin"])
        .select(
            "g",
            "num",
            "den",
            "bin",
            (F.col("rank") - (F.col("cum") - F.col("cnt"))).alias("local_rank"),
        )
    )

    hits = binned.join(F.broadcast(spec), ["g", "bin"])
    w = Window.partitionBy("g", "num", "den").orderBy("v")
    picked = hits.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == F.col("local_rank")
    )
    return picked.select(
        F.col("g").alias(group_col),
        (F.col("num").cast("double") / F.col("den")).alias("q"),
        F.col("v").alias("value"),
    )
