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
