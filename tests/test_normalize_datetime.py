"""Normalization + datetime dialect translation."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from pmp_analytics_spark.functions.datetime_fmt import (
    format_date,
    strptime_to_java,
    to_date_lenient,
)
from pmp_analytics_spark.functions.normalize import (
    assemble_address,
    clean_key,
    last_token,
    null_or_empty,
    replace_strict,
    str_to_int,
    surrogate_key,
    zfill,
)


def _vals(spark, data, cols, expr):
    df = spark.createDataFrame(data, cols)
    return [r["v"] for r in df.select(expr.alias("v")).collect()]


def test_strptime_translation():
    assert strptime_to_java("%Y-%m-%d") == "yyyy-MM-dd"
    assert strptime_to_java("%m/%d/%Y") == "MM/dd/yyyy"
    assert strptime_to_java("%Y%m%d") == "yyyyMMdd"
    assert strptime_to_java("%B %d, %Y") == "MMMM dd, yyyy"
    assert strptime_to_java("%Y-%m-%dT%H:%M:%S") == "yyyy-MM-dd'T'HH:mm:ss"


def test_to_date_lenient(spark):
    got = _vals(
        spark,
        [("20240131",), ("not a date",), ("",)],
        ["s"],
        to_date_lenient("s", "%Y%m%d"),
    )
    assert got == [datetime.date(2024, 1, 31), None, None]


def test_month_name_roundtrip(spark):
    got = _vals(spark, [("March 05, 2024",)], ["s"], to_date_lenient("s", "%B %d, %Y"))
    assert got == [datetime.date(2024, 3, 5)]
    back = _vals(
        spark,
        [(datetime.date(2024, 3, 5),)],
        ["d"],
        format_date("d", "%B %d, %Y"),
    )
    assert back == ["March 05, 2024"]


def test_null_or_empty(spark):
    got = _vals(spark, [("",), (" ",), (None,), ("x",)], ["s"], null_or_empty("s"))
    assert got == [True, False, True, False]


def test_clean_and_zfill(spark):
    assert _vals(spark, [("  ab ",)], ["s"], clean_key("s")) == ["AB"]
    assert _vals(spark, [("42",)], ["s"], zfill("s", 6)) == ["000042"]


def test_str_to_int_lenient(spark):
    got = _vals(spark, [("12",), ("x",), ("",)], ["s"], str_to_int("s"))
    assert got == [12, None, None]


def test_last_token(spark):
    got = _vals(spark, [("JANE DOE MD",), ("SINGLE",)], ["s"], last_token("s"))
    assert got == ["MD", "SINGLE"]


def test_surrogate_key(spark):
    got = _vals(
        spark,
        [("Smith", "LIC12345")],
        ["name", "lic"],
        surrogate_key("name", "lic"),
    )
    # last3("SMITH") + last4("LIC12345")
    assert got == ["ITH2345"]


def test_assemble_address_skips_nulls(spark):
    df = spark.createDataFrame([("1 Main", None, "Phoenix")], "a string, b string, c string")
    got = [r["v"] for r in df.select(assemble_address("a", "b", "c").alias("v")).collect()]
    assert got == ["1 Main Phoenix"]


def test_replace_strict(spark):
    expr = replace_strict("s", {"true": "YES", "false": "NO"})
    got = _vals(spark, [("true",), ("false",), ("other",)], ["s"], expr)
    assert got == ["YES", "NO", None]
