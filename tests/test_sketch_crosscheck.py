"""Third-implementation cross-checks for the sketch operators: the
DuckDB oracles already replay the Spark math SQL-side; here a plain
hashlib/Python replica recomputes registers, counters, bottom-k sets,
and estimates INDEPENDENTLY of both engines, over a battery of key sets
(empty, singleton, duplicates, unicode, mixed sizes) run as ONE grouped
Spark job per operator. An error in the shared md5 idiom or the
estimator math would have to be reproduced identically three times to
slip through."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from pmp_analytics_spark.operators.sketches import (
    HASH_BITS,
    cms_estimate,
    cms_sketch,
    hll_alpha,
    hll_cardinality,
    kmv_cardinality,
    kmv_sketch,
)

CASES: dict[str, list[str]] = {
    "single": ["only-one"],
    "dupes": ["a", "a", "a", "b", "b"],
    "unicode": ["héllo", "wörld", "héllo", "日本語", "ключ"],
    "hundred": [f"k-{i}" for i in range(100)],
    "mixed": [f"u{i % 37}" for i in range(500)],
}


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _py_hll(keys: list[str], p: int) -> tuple[float, int, int]:
    m = 1 << p
    width = HASH_BITS - p
    regs = [0] * m
    for k in keys:
        h = _h60(k)
        j = h % m
        w = h >> p
        rho = width + 1 if w == 0 else width + 1 - w.bit_length()
        regs[j] = max(regs[j], rho)
    s = sum(1 << (width + 1 - r) for r in regs)
    v = sum(1 for r in regs if r == 0)
    c = hll_alpha(m) * m * m * float(1 << (width + 1))
    raw = c / float(s)
    est = m * math.log(m / v) if (raw <= 2.5 * m and v > 0) else raw
    return round(est, 2), s, v


def _cases_df(spark):
    rows = [(case, k) for case, keys in CASES.items() for k in keys]
    return spark.createDataFrame(rows, ["case", "k"])


def test_hll_matches_pure_python(spark):
    got = {
        r["case"]: (r["est_distinct"], r["est_distinct_s"], r["est_distinct_v"])
        for r in hll_cardinality(_cases_df(spark), "k", ["case"], p=8).collect()
    }
    for case, keys in CASES.items():
        assert got[case] == _py_hll(keys, 8), case


def test_kmv_matches_pure_python(spark):
    k = 16
    sk = kmv_sketch(_cases_df(spark), "k", ["case"], k=k)
    got_rows = {
        r["case"]: (r["est_distinct"], r["n_seen"], r["hv_k"])
        for r in kmv_cardinality(sk, ["case"], k=k).collect()
    }
    for case, keys in CASES.items():
        hs = sorted({_h60(x) for x in keys})[:k]
        n_seen = len(hs)
        if n_seen < k:
            est, hv_k = float(n_seen), 0
        else:
            hv_k = hs[-1]
            est = round((k - 1) * float(1 << HASH_BITS) / float(hv_k), 2)
        assert got_rows[case] == (est, n_seen, hv_k), case


def test_cms_matches_pure_python(spark):
    d, w = 4, 64
    keys = CASES["mixed"]
    df = spark.createDataFrame([(x,) for x in keys], ["k"])
    est = cms_estimate(cms_sketch(df, "k", d=d, w=w), df.distinct(), "k", d=d, w=w)
    got = {r["k"]: r["est_count"] for r in est.collect()}

    cells: dict[tuple[int, int], int] = {}
    for x in keys:
        for i in range(d):
            b = _h60(f"{i}|{x}") % w
            cells[(i, b)] = cells.get((i, b), 0) + 1
    for x in set(keys):
        expect = min(cells.get((i, _h60(f"{i}|{x}") % w), 0) for i in range(d))
        assert got[x] == expect, x


def test_empty_keys_match_pure_python_global(spark):
    """The 'empty' case of the battery: a group with zero rows can never
    emit a grouped row, so empty keys cross-check through the GLOBAL
    (no-group) estimator shape — all three implementations must agree
    that an empty key set estimates exactly 0 (HLL via the all-zero
    linear-counting branch, KMV via the unfilled-sketch exact branch)."""
    empty = spark.range(0).select(F.col("id").cast("string").alias("k"))

    py_est, py_s, py_v = _py_hll([], 8)
    assert py_est == 0.0 and py_v == (1 << 8)
    hll_row = hll_cardinality(empty, "k", [], p=8).collect()
    assert len(hll_row) == 1
    got = hll_row[0]
    assert (got["est_distinct"], got["est_distinct_s"], got["est_distinct_v"]) == (
        py_est, py_s, py_v,
    )

    kmv_row = kmv_cardinality(kmv_sketch(empty, "k", [], k=16), [], k=16).collect()
    assert len(kmv_row) == 1
    assert (kmv_row[0]["est_distinct"], kmv_row[0]["n_seen"], kmv_row[0]["hv_k"]) == (
        0.0, 0, 0,
    )
