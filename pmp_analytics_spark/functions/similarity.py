"""String-similarity scalar functions (Jaro-Winkler).

The reference's one genuinely custom scalar op: ``polars_distance``'s
``dist_str.jaro_winkler`` used in the overdose fuzzy-match join
(od.py:83,125). Spark has no built-in Jaro-Winkler, so this is the engine's
designated Pandas-UDF slow path (SURVEY.md §4.2): Arrow-batched, one Python
hop per batch, never per row — and it only ever runs on blocked candidate
pairs, never the full cross product. Semantics: standard Jaro with Winkler
prefix bonus, scaling 0.1, max prefix 4, boost threshold 0.7, and
integer-half transposition counting — matching DuckDB's
``jaro_winkler_similarity`` so the DuckDB oracle validates the fuzzy join
end-to-end.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

def jaro(s1: str, s2: str) -> float:
    """Plain Jaro similarity in [0, 1].

    Transpositions use the integer-half convention (``mismatches // 2``,
    as in Apache Commons Text and DuckDB) rather than the fractional 0.5
    variant (rapidfuzz) — chosen so results agree bit-for-bit with the
    DuckDB oracle. The two differ only when the mismatch count is odd.
    """
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0  # DuckDB convention: empty vs anything (incl. empty) is 0
    if s1 == s2:
        return 1.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, ch in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == ch:
                flags1[i] = True
                flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[k]:
                k += 1
            if s1[i] != s2[k]:
                transpositions += 1
            k += 1
    t = transpositions // 2
    m = matches
    return (m / len1 + m / len2 + (m - t) / m) / 3


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1, boost_threshold: float = 0.7) -> float:
    """Jaro-Winkler similarity; prefix bonus (≤4 chars) applied only above
    the boost threshold — the conventional definition shared by DuckDB."""
    j = jaro(s1, s2)
    if j <= boost_threshold:
        return j
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a == b:
            prefix += 1
        else:
            break
    return j + prefix * prefix_weight * (1 - j)


def _jw_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batch JW kernel.

    Fast path: DuckDB's native ``jaro_winkler_similarity`` evaluated over
    the whole batch in-process (C++ speed, and bit-identical to the DuckDB
    oracle by construction — it IS the oracle's function). Fallback: the
    pure-Python reference implementation above.
    """
    try:
        import duckdb

        con = duckdb.connect()
        batch = pd.DataFrame({"a": a, "b": b})
        out = con.execute(
            "SELECT jaro_winkler_similarity(a, b) AS s FROM batch"
        ).df()["s"]
        con.close()
        return out.astype("float64")
    except ImportError:
        return pd.Series(
            [jaro_winkler(x, y) if x is not None and y is not None else None for x, y in zip(a, b)],
            dtype="float64",
        )


# DoubleType() (not the "double" DDL string) so the UDF can be declared at
# import time without an active SparkSession. Marked non-deterministic —
# it is semantically deterministic, but the flag stops Catalyst from
# duplicating the (expensive) UDF into both a pushed-down Filter and the
# final Project (two ArrowEvalPython nodes = 2× the Python work).
jaro_winkler_udf = pandas_udf(_jw_batch, DoubleType()).asNondeterministic()


def jw_similarity(a: Column | str, b: Column | str) -> Column:
    """Column expression: Jaro-Winkler similarity of two string columns."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return jaro_winkler_udf(a, b)
