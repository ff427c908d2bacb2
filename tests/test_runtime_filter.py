"""Runtime bloom-filter join pruning — the 100 TB scan-reduction path.

When a selective dimension filters a shuffle join, Spark (3.3+) can build
a bloom filter from the filtered creation side at runtime and push a
``might_contain`` predicate into the fact-table scan, skipping most of
the fact rows before the shuffle. On a 1000-executor cluster joining a
filtered dim against a 100 TB fact this is the difference between
shuffling the whole fact table and shuffling the matching slice — so the
capability (and the config knobs that gate it) is pinned here the same
way broadcast/skew handling are pinned in test_plans/test_aqe_skew.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from pmp_analytics_spark.plans import physical_plan

SF = "/root/testdata/sf0.01"


@contextmanager
def _conf(spark, **kv):
    keys = {k.replace("__", "."): v for k, v in kv.items()}
    old = {k: spark.conf.get(k, None) for k in keys}
    try:
        for k, v in keys.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _fact_dim_join(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    dim = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderdate"
    )
    return li.join(dim, li.l_orderkey == dim.o_orderkey).groupBy("o_orderdate").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev")
    )


def test_bloom_filter_injected_on_shuffle_join(spark):
    # Force the shuffle-join regime (no broadcast) and drop the
    # application-side size floor so a local-scale fact scan qualifies;
    # on a real cluster the defaults (10 GB floor) gate it to big scans.
    with _conf(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "50MB",
        },
    ):
        df = _fact_dim_join(spark)
        plan = physical_plan(df)
        assert "might_contain" in plan.lower(), plan[:2000]
        rows = df.count()
    assert rows > 0


def test_bloom_filter_result_identical_to_unfiltered_plan(spark):
    # The runtime filter is a pure pruning optimization — results must
    # be identical with it on and off (decimal sum: order-independent).
    with _conf(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        },
    ):
        on = sorted(map(tuple, _fact_dim_join(spark).collect()))
    with _conf(
        spark, **{"spark.sql.optimizer.runtime.bloomFilter.enabled": "false"}
    ):
        off = sorted(map(tuple, _fact_dim_join(spark).collect()))
    assert on == off
