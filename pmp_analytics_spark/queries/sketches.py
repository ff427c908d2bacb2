"""Sketch + partial-reaggregation query pack: deterministic HyperLogLog
cardinality, count-min heavy hitters, and a continuous-aggregate-style
cascaded rollup. These are the bounded-state forms of the exact
distinct/frequency/rollup queries the rest of the registry runs — the
operators a 100 TB deployment swaps in when ``COUNT(DISTINCT)`` and
per-key counting become the dominant shuffle (see operators/sketches.py
for the scale/mergeability argument and the published basis).

Every query here is fully oracle-checked: the DuckDB SQL replays the
identical md5-family hash, the identical integer register/counter math,
and the identical branch predicates, so the sketch STATE (not just the
estimate) hash-matches across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pmp_analytics_spark.operators.sketches import (
    cms_estimate,
    cms_oracle_sql,
    cms_sketch,
    hll_cardinality,
    hll_oracle_sql,
)
from pmp_analytics_spark.sources.reader import load_table

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Q: event_cardinality_hll — per-event-type HyperLogLog distinct counts
# next to their exact values, for BOTH a low-cardinality key (user_id:
# exercises the linear-counting small-range branch) and a
# high-cardinality key (event_id: exercises the raw harmonic-mean
# branch). The oracle replays register construction bit-for-bit and the
# result carries the integer sketch state (_s denominator, _v empty
# registers) so the hash check pins the registers, not just the rounded
# estimate. Scale shape: two shuffles bounded by m=256 rows per group —
# vs COUNT(DISTINCT)'s shuffle of every distinct key.
# --------------------------------------------------------------------------
_HLL_P = 8


@query(
    "event_cardinality_hll",
    f"""
    WITH __u AS (
        {hll_oracle_sql("CAST(user_id AS VARCHAR)", ["event_type"], "events", _HLL_P, "users_hll")}
    ), __e AS (
        {hll_oracle_sql("CAST(event_id AS VARCHAR)", ["event_type"], "events", _HLL_P, "events_hll")}
    ), __x AS (
        SELECT event_type,
               COUNT(DISTINCT user_id) AS users_exact,
               COUNT(DISTINCT event_id) AS events_exact
        FROM events GROUP BY 1
    )
    SELECT x.event_type,
           x.users_exact, u.users_hll, u.users_hll_s, u.users_hll_v,
           x.events_exact, e.events_hll, e.events_hll_s, e.events_hll_v
    FROM __x x
    JOIN __u u ON x.event_type = u.event_type
    JOIN __e e ON x.event_type = e.event_type
    """,
)
def event_cardinality_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("users_exact"),
        F.countDistinct("event_id").alias("events_exact"),
    )
    users = hll_cardinality(ev, "user_id", ["event_type"], p=_HLL_P, est_col="users_hll")
    events = hll_cardinality(
        ev, "event_id", ["event_type"], p=_HLL_P, est_col="events_hll"
    )
    return (
        exact.join(users, "event_type")
        .join(events, "event_type")
        .select(
            "event_type",
            "users_exact",
            "users_hll",
            "users_hll_s",
            "users_hll_v",
            "events_exact",
            "events_hll",
            "events_hll_s",
            "events_hll_v",
        )
    )


# --------------------------------------------------------------------------
# Q: event_heavy_hitters_cms — count-min-sketch heavy hitters: per-user
# event frequencies estimated from a d=4 x w=512 counter sketch, keys
# whose ESTIMATE clears 1.2x the average-per-key threshold reported next
# to their true counts (overcount >= 0 always, by the CMS one-sided
# guarantee). The sketch build shuffles at most d*w cells per partition
# (map-side partial sum); the point-query side broadcasts the <= 2048-row
# sketch. Threshold is relative (1.2 x total/candidates) so the query is
# scale-stable across sf. Pure integer math -> exact oracle.
# --------------------------------------------------------------------------
_CMS_D = 4
_CMS_W = 512


@query(
    "event_heavy_hitters_cms",
    f"""
    WITH __est AS (
        {cms_oracle_sql("user_id", "events", _CMS_D, _CMS_W, "est_count")}
    ), __true AS (
        SELECT CAST(user_id AS VARCHAR) AS k, user_id, COUNT(*) AS true_count
        FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
    ), __tot AS (
        SELECT COUNT(*) AS total, COUNT(DISTINCT user_id) AS ncand
        FROM events WHERE user_id IS NOT NULL
    )
    SELECT t.user_id, e.est_count, t.true_count,
           e.est_count - t.true_count AS overcount
    FROM __est e
    JOIN __true t ON e.k = t.k
    CROSS JOIN __tot
    WHERE e.est_count >= 1.2 * (CAST(total AS DOUBLE) / ncand)
    """,
)
def event_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    sketch = cms_sketch(ev, "user_id", d=_CMS_D, w=_CMS_W)
    true_counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_count"))
    est = cms_estimate(
        sketch, true_counts.select("user_id"), "user_id", d=_CMS_D, w=_CMS_W
    )
    totals = ev.agg(
        F.count(F.lit(1)).alias("__total"),
        F.countDistinct("user_id").alias("__ncand"),
    )
    return (
        est.join(true_counts, "user_id")
        .crossJoin(F.broadcast(totals))
        .where(
            F.col("est_count")
            >= F.lit(1.2) * (F.col("__total").cast("double") / F.col("__ncand"))
        )
        .select(
            "user_id",
            "est_count",
            "true_count",
            (F.col("est_count") - F.col("true_count")).alias("overcount"),
        )
    )


# --------------------------------------------------------------------------
# Q: event_rollup_cascade — continuous-aggregate-style cascaded rollup
# (the hypertable pattern): daily per-type stats REAGGREGATED from
# hourly partials rather than from raw rows — sum of partial sums,
# min/max of partial min/max, count of partial counts, hour coverage as
# a free by-product. At 100 TB the hourly layer is the materialized
# rollup each micro-batch maintains incrementally; the daily (weekly,
# monthly...) layers then read partials, never raw events — the oracle
# replays the same two-stage tree so the float summation shape matches.
# --------------------------------------------------------------------------
@query(
    "event_rollup_cascade",
    """
    WITH __hourly AS (
        SELECT CAST(EPOCH(DATE_TRUNC('hour', ts)) AS BIGINT) AS hour_s,
               CAST(EPOCH(DATE_TRUNC('day', ts)) AS BIGINT) AS day_s,
               event_type,
               COUNT(*) AS n,
               SUM(value) AS vsum,
               MIN(value) AS vmin,
               MAX(value) AS vmax
        FROM events
        GROUP BY 1, 2, 3
    )
    SELECT day_s, event_type,
           CAST(SUM(n) AS BIGINT) AS n_events,
           COUNT(*) AS n_hours,
           ROUND(SUM(vsum), 2) AS total_value,
           ROUND(MIN(vmin), 6) AS min_value,
           ROUND(MAX(vmax), 6) AS max_value
    FROM __hourly
    GROUP BY 1, 2
    """,
)
def event_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_s"),
        F.unix_timestamp(F.date_trunc("day", "ts")).alias("day_s"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("vsum"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    return hourly.groupBy("day_s", "event_type").agg(
        F.sum("n").alias("n_events"),
        F.count(F.lit(1)).alias("n_hours"),
        F.round(F.sum("vsum"), 2).alias("total_value"),
        F.round(F.min("vmin"), 6).alias("min_value"),
        F.round(F.max("vmax"), 6).alias("max_value"),
    )
