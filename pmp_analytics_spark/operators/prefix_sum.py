"""Distributed exact prefix sum (running total) without a global window.

A naive ``SUM(x) OVER (ORDER BY k)`` compiles to a single-partition window
(`Exchange SinglePartition`) — one task scans the entire dataset, which is
the canonical 100 TB anti-pattern. The scalable formulation is the classic
two-phase scan:

1. range-partition by the order key (cluster-wide sort order, ~even splits);
2. per-partition partial sums — a tiny aggregate of ``n_partitions`` rows;
3. exclusive prefix over those partials (a window over n_partitions rows —
   constant-size regardless of data scale);
4. broadcast the offsets back and add the intra-partition running sum
   (partition-local window, no further shuffle).

The reference has no running totals (its one cumulative op is the
gaps-and-islands session numbering, `unreg_pharmacists.py`-adjacent); this
operator exists for the north-star pretraining pipeline — sequence packing
(see operators/packing.py) needs a corpus-wide token offset per document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def running_total(
    df: DataFrame,
    value_col: str,
    order_col: str,
    out_col: str = "running_total",
    include_current: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact running total of ``value_col`` in ``order_col`` order.

    ``include_current=False`` gives the EXCLUSIVE prefix (sum of strictly
    earlier rows — the "offset before me" form packing needs);
    ``True`` gives the inclusive running total.

    Requirements: ``order_col`` values must be unique (they define the
    global order). The input subtree is evaluated twice (once for the
    partial sums, once for the final plan) — cache upstream if it is
    expensive; both evaluations see identical partition boundaries because
    Spark's range partitioner samples with a deterministic seed.

    Scale: two shuffles total (the range exchange + the n_partitions-row
    aggregate); the offsets side is O(num_partitions) rows and is
    broadcast. No stage ever holds more than one partition's rows.
    """
    spark = df.sparkSession
    n_part = num_partitions or max(spark.sparkContext.defaultParallelism, 1)
    ranged = df.repartitionByRange(n_part, F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )

    partials = ranged.groupBy("__pid").agg(F.sum(value_col).alias("__psum"))
    w_off = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = partials.select(
        "__pid",
        F.coalesce(F.sum("__psum").over(w_off), F.lit(0).cast("long")).alias(
            "__offset"
        ),
    )

    upper = 0 if include_current else -1
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    return (
        ranged.join(F.broadcast(offsets), on="__pid")
        .withColumn(
            out_col,
            (
                F.coalesce(F.sum(value_col).over(w_local), F.lit(0).cast("long"))
                + F.col("__offset")
            ).cast("long"),
        )
        .drop("__pid", "__offset")
    )
