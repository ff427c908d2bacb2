"""Sampling operators.

The reference's ``.sample(20)`` (check_masked.py:73) is an exact-N random
sample — Spark's ``df.sample()`` is fraction-based and approximate, so
exact-N needs an order-then-limit. Two variants:

- ``exact_sample``: orderBy(rand(seed)).limit(n) — random per seed, but the
  row set depends on Spark's rand stream, so it cannot be oracle-checked
  across engines.
- ``deterministic_sample``: orderBy(md5(key)).limit(n) — a uniform
  pseudo-random sample that is REPRODUCIBLE across engines (md5 is
  engine-independent), used for the DuckDB-validated query. Both plan as
  TakeOrderedAndProject (per-partition heap of n, no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_sample(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    return df.orderBy(F.rand(seed)).limit(n)


def deterministic_sample(df: DataFrame, key_col: str, n: int, salt: str = "") -> DataFrame:
    """Exact-N engine-independent pseudo-random sample: order by
    md5(salt || key) and take n. Changing ``salt`` redraws the sample."""
    return df.orderBy(F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), F.col(key_col)).limit(n)
