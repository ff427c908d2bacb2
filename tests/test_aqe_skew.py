"""AQE runtime skew-join splitting — the engine's FIRST line of defense
against hot keys (manual salting, operators/partitioning.py, is the
fallback for joins AQE can't split, e.g. aggregation-feeding shapes).

This pins the config knobs actually doing that job: with skewJoin
enabled, a hot-key sort-merge join's final adaptive plan must show the
skewed partition split across multiple reader tasks — so a config
regression (someone disabling AQE or skewJoin session-wide) fails a
test instead of shipping a straggler to the 1000-executor cluster.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32768",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the SMJ shape
}


@pytest.fixture()
def skew_confs(spark):
    saved = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark, skew_confs):
    # one hot key carrying 500k wide rows vs a 100-key tail; the dim is
    # tiny but broadcast is disabled to force the shuffled-join shape
    # where skew actually bites
    left = spark.range(0, 500_000).select(
        F.lit(0).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("v"),
    ).union(
        spark.range(0, 10_000).select(
            (F.col("id") % 100 + 1).alias("k"), F.lit("x").alias("v")
        )
    )
    right = spark.range(0, 101).select(
        F.col("id").alias("k"), F.lit("dim").alias("name")
    )
    j = left.join(right, on="k")
    # collect() executes THIS DataFrame's own QueryExecution — count()
    # or a sink write would finalize a different plan object
    assert len(j.collect()) == 510_000
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, f"AQE did not split the skewed join:\n{plan}"
    assert "skewed" in plan  # AQEShuffleRead ... skewed reader node
