"""As-of and range join semantics (operators/joins.py).

Hand-computed fixtures pin the tricky cases: unmatched left rows, the
<=-at-equal-timestamps boundary, forward direction, tolerance nulling,
and determinism under input repartitioning (the union+window formulation
must not depend on partition layout).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pmp_analytics_spark.operators.joins import asof_join, range_join


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", 10, 100.0),
            ("A", 20, 101.0),
            ("A", 25, 102.0),
            ("B", 5, 50.0),
            ("C", 7, 70.0),  # no quotes for C at all
        ],
        ["sym", "t", "price"],
    )
    quotes = spark.createDataFrame(
        [
            ("A", 8, 99.5),
            ("A", 20, 100.5),  # equal-timestamp case vs trade t=20
            ("A", 30, 103.0),
            ("B", 6, 49.9),  # after B's only trade
        ],
        ["sym", "qt", "bid"],
    )
    return trades, quotes


def test_asof_backward(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on=["sym"], left_ts="t", right_ts="qt")
    rows = {(r.sym, r.t): (r.qt, r.bid) for r in out.collect()}
    assert rows[("A", 10)] == (8, 99.5)
    assert rows[("A", 20)] == (20, 100.5)  # <= includes the equal instant
    assert rows[("A", 25)] == (20, 100.5)
    assert rows[("B", 5)] == (None, None)  # quote only exists later
    assert rows[("C", 7)] == (None, None)  # key absent on the right
    assert out.count() == trades.count()  # left-join row preservation


def test_asof_forward(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="t", right_ts="qt", direction="forward"
    )
    rows = {(r.sym, r.t): (r.qt, r.bid) for r in out.collect()}
    assert rows[("A", 10)] == (20, 100.5)
    assert rows[("A", 20)] == (20, 100.5)  # >= includes the equal instant
    assert rows[("A", 25)] == (30, 103.0)
    assert rows[("B", 5)] == (6, 49.9)
    assert rows[("C", 7)] == (None, None)


def test_asof_tolerance(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades,
        quotes,
        on=["sym"],
        left_ts="t",
        right_ts="qt",
        tolerance_seconds=2,
    )
    rows = {(r.sym, r.t): (r.qt, r.bid) for r in out.collect()}
    assert rows == {
        ("A", 10): (8, 99.5),  # gap 2 == tolerance → kept
        ("A", 20): (20, 100.5),  # gap 0
        ("A", 25): (None, None),  # gap 5 > 2 → nulled
        ("B", 5): (None, None),
        ("C", 7): (None, None),
    }


def test_asof_partitioning_invariant(spark, trades_quotes):
    trades, quotes = trades_quotes
    base = asof_join(trades, quotes, on=["sym"], left_ts="t", right_ts="qt")
    shuffled = asof_join(
        trades.repartition(7), quotes.repartition(3), on=["sym"], left_ts="t", right_ts="qt"
    )
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, shuffled.collect()))


def test_asof_rejects_collisions(spark, trades_quotes):
    trades, quotes = trades_quotes
    bad = quotes.withColumnRenamed("bid", "price")  # collides with left
    with pytest.raises(ValueError, match="collide"):
        asof_join(trades, bad, on=["sym"], left_ts="t", right_ts="qt")
    with pytest.raises(ValueError, match="direction"):
        asof_join(trades, quotes, on=["sym"], left_ts="t", right_ts="qt", direction="nearest")


def test_range_join(spark):
    points = spark.createDataFrame(
        [("u1", 5), ("u1", 10), ("u1", 15), ("u2", 10)], ["k", "t"]
    )
    intervals = spark.createDataFrame(
        [("u1", 5, 11, "i1"), ("u1", 14, 20, "i2"), ("u2", 0, 5, "i3")],
        ["k", "lo", "hi", "iv"],
    )
    out = range_join(
        points, intervals, on=["k"], left_ts="t", lo=F.col("lo"), hi=F.col("hi")
    )
    got = sorted((r.k, r.t, r.iv) for r in out.collect())
    # half-open [lo, hi): t=5 in [5,11) yes; t=10 in [5,11) yes; t=15 in
    # [14,20) yes; u2 t=10 not in [0,5).
    assert got == [("u1", 5, "i1"), ("u1", 10, "i1"), ("u1", 15, "i2")]
