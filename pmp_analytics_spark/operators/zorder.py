"""Z-order (Morton) data layout — multidimensional clustering for scan
pruning.

At 100 TB the dominant cost of a selective query is HOW MANY FILES its
predicate can skip: parquet row-group min/max statistics prune a file
only if the filtered column is clustered within it. Sorting clusters ONE
column perfectly and leaves every other unclustered; interleaving the
bits of two (or more) columns into a Morton code and range-partitioning
on it bounds EVERY interleaved dimension within each file — the layout
trick behind Delta/Iceberg ``ZORDER BY`` (public engineering: the Morton
space-filling-curve literature and the table-format OPTIMIZE docs).

Pure integer arithmetic (shift/mask inside a JVM ``aggregate`` HOF), so
the code is engine-exact against a SQL replay; the layout step itself is
one ``repartitionByRange`` on the z column — a single range exchange,
the same cost as a sort-based write.

Reference analogue: none (the reference reads vendor CSVs); this is
north-star table-layout maintenance, next to small-file compaction
(operators/maintenance.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value16(x_expr: str, y_expr: str) -> Column:
    """Morton interleave of the low 16 bits of two non-negative integer
    SQL expressions → a 32-bit z code (bit 2i from x, bit 2i+1 from y).
    Callers normalize dims into [0, 2^16) first (modulo or rank-scale).
    SQL-string inputs keep the shift amounts column-valued inside the
    HOF lambda (the python ``shiftleft`` builtin takes only literal
    shift counts)."""
    return F.expr(
        f"""aggregate(
            sequence(0, 15),
            CAST(0 AS BIGINT),
            (acc, i) -> acc
                + (((CAST(({x_expr}) AS BIGINT) >> i) & 1) << (i * 2))
                + (((CAST(({y_expr}) AS BIGINT) >> i) & 1) << (i * 2 + 1))
        )"""
    )


def zorder_partitioned(
    df: DataFrame, x_expr: str, y_expr: str, n_files: int
) -> DataFrame:
    """Cluster ``df`` for writing: compute the z code and range-exchange
    into ``n_files`` partitions ordered by it, so each output file holds
    one contiguous z-range — bounded min/max spans in BOTH dimensions,
    prunable by either predicate. One shuffle; drop ``__z`` after write
    if the code column is unwanted."""
    return df.withColumn("__z", z_value16(x_expr, y_expr)).repartitionByRange(
        n_files, "__z"
    )
