"""Jaro-Winkler: python implementation vs DuckDB's jaro_winkler_similarity
(the oracle engine), plus the Spark pandas_udf path end-to-end."""

from __future__ import annotations

import duckdb
import pytest

from pmp_analytics_spark.functions.similarity import jaro_winkler, jw_similarity

PAIRS = [
    ("martha", "marhta"),
    ("dixon", "dicksonx"),
    ("jellyfish", "smellyfish"),
    ("", ""),
    ("", "abc"),
    ("abc", "abc"),
    ("SMITH JOHN", "SMITH JON"),
    ("GARCIA MARIA", "GARCIA MARIO"),
    ("a", "b"),
    ("ab", "ba"),
    ("CRATE", "TRACE"),
    ("DWAYNE", "DUANE"),
]


def duck_jw(a: str, b: str) -> float:
    return duckdb.sql(f"SELECT jaro_winkler_similarity('{a}', '{b}')").fetchone()[0]


@pytest.mark.parametrize("a,b", PAIRS)
def test_jw_matches_duckdb(a, b):
    assert jaro_winkler(a, b) == pytest.approx(duck_jw(a, b), abs=1e-9)


def test_jw_udf_on_spark(spark):
    df = spark.createDataFrame(PAIRS, ["a", "b"])
    rows = df.select("a", "b", jw_similarity("a", "b").alias("jw")).collect()
    for r in rows:
        assert r["jw"] == pytest.approx(duck_jw(r["a"], r["b"]), abs=1e-9)


def test_jw_null_safe(spark):
    df = spark.createDataFrame([("x", None), (None, None)], "a string, b string")
    rows = df.select(jw_similarity("a", "b").alias("jw")).collect()
    assert all(r["jw"] is None for r in rows)


# ---------------------------------------------------------------------------
# _md5_sample_rows memo (optimization r12): the quantizer training sample is
# collected once per (session, corpus plan, cols, n) and shared by every fit
# over the same corpus — rows must be identical to the direct collect, the
# memo must HIT for a plan-identical frame (including pre/post-repartition),
# and MISS for a different n or a different corpus.
# ---------------------------------------------------------------------------
def test_md5_sample_rows_memo(spark):
    from pyspark.sql import functions as F

    from pmp_analytics_spark.operators import similarity_search as ss

    df = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(F.col("id").cast("double"), F.lit(1.0)).alias("embedding"),
    )
    direct = (
        df.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")))
        .limit(10)
        .collect()
    )
    ss._SAMPLE_MEMO.clear()
    got = ss._md5_sample_rows(df, "vec_id", "embedding", 10)
    assert got == direct
    assert len(ss._SAMPLE_MEMO) == 1
    # plan-identical frame (fresh object) and the repartitioned variant
    # both hit the same entry: md5 is a total order over distinct ids
    df2 = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(F.col("id").cast("double"), F.lit(1.0)).alias("embedding"),
    )
    assert ss._md5_sample_rows(df2, "vec_id", "embedding", 10) == direct
    assert len(ss._SAMPLE_MEMO) == 1
    # different n -> its own entry, correct rows
    got20 = ss._md5_sample_rows(df, "vec_id", "embedding", 20)
    assert len(got20) == 20 and got20[:10] != [] and len(ss._SAMPLE_MEMO) == 2
    # different corpus -> its own entry
    df3 = spark.range(60).select(
        F.col("id").alias("vec_id"),
        F.array(F.col("id").cast("double"), F.lit(1.0)).alias("embedding"),
    )
    ss._md5_sample_rows(df3, "vec_id", "embedding", 10)
    assert len(ss._SAMPLE_MEMO) == 3
    ss._SAMPLE_MEMO.clear()
