"""Bucketing for co-located fact-fact joins — the 100 TB shuffle killer.

Dimension joins broadcast; fact-fact joins (lineitem ⋈ orders) shuffle
both sides on the key EVERY query. Bucketing pays that shuffle once at
write time: both tables bucketed by the join key join with ZERO Exchange
in the plan. This test proves the engine's bucketed-join path end-to-end:
write both sides bucketed, join, assert the plan has no shuffle, and the
result matches the plain join.
"""

from __future__ import annotations

import re

import pytest

from pmp_analytics_spark.plans.audit import physical_plan
from pmp_analytics_spark.sources.reader import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # saveAsTable writes under the session's spark-warehouse dir (static
    # conf — cannot be pointed at a tmpdir post-startup); tables dropped
    # on teardown.
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("li_bucketed")
    )
    (
        orders.withColumnRenamed("o_orderkey", "l_orderkey")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("ord_bucketed")
    )
    yield "li_bucketed", "ord_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li_t, ord_t = bucketed_tables
    joined = spark.table(li_t).join(spark.table(ord_t), on="l_orderkey")
    plan = physical_plan(joined)
    shuffles = re.findall(r"^\(\d+\)\s+Exchange", plan, re.MULTILINE)
    assert not shuffles, f"bucketed join must not shuffle:\n{plan}"

    # same answer as the plain (shuffling) join
    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    expected = li.join(orders, on="l_orderkey").count()
    assert joined.count() == expected
    assert expected > 0
