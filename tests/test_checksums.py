"""Checksum validation against hand-computed fixtures.

DEA math (awarxe_cleanup.py:57-75 in the reference): AB1234563 —
(1+3+5) + 2*(2+4+6) = 33 → check digit 3. NPI 1234567893 is the
canonical valid example (CMS spec): doubled-odd fold 23 + even 20 +
24 = 67 → (10 - 67 % 10) % 10 = 3.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pmp_analytics_spark.functions.checksums import dea_is_valid, luhn_mod10_ok, npi_is_valid


def _eval(spark, expr_fn, values):
    df = spark.createDataFrame([(v,) for v in values], ["s"])
    rows = df.select("s", expr_fn("s").alias("ok")).collect()
    return {r["s"]: r["ok"] for r in rows}


def test_dea_checksum(spark):
    got = _eval(
        spark,
        dea_is_valid,
        [
            "AB1234563",  # valid: checksum 33 -> 3
            "ab1234563",  # valid after normalization (upper/trim)
            " AB1234563 ",
            "AB1234567",  # bad check digit
            "XB1234563",  # bad registrant first letter
            "AB123456",  # too short
            "AB12345631",  # too long
            "A11234563",  # second char must be a letter
            "",
        ],
    )
    assert got["AB1234563"] is True
    assert got["ab1234563"] is True
    assert got[" AB1234563 "] is True
    assert got["AB1234567"] is False
    assert got["XB1234563"] is False
    assert got["AB123456"] is False
    assert got["AB12345631"] is False
    assert got["A11234563"] is False
    assert got[""] is False


def test_npi_checksum(spark):
    got = _eval(
        spark,
        npi_is_valid,
        ["1234567893", "1234567890", "123456789", "12345678931", "1245319599"],
    )
    assert got["1234567893"] is True  # CMS spec example
    assert got["1234567890"] is False
    assert got["123456789"] is False
    assert got["12345678931"] is False


def test_luhn(spark):
    got = _eval(spark, luhn_mod10_ok, ["79927398713", "79927398710", "0"])
    assert got["79927398713"] is True  # canonical Luhn example
    assert got["79927398710"] is False
    assert got["0"] is False  # single digit rejected


def test_npi_matches_python_reference(spark):
    """Cross-check the HOF implementation against a plain-Python Luhn+24
    for all of a small numeric range."""

    def py_npi(s: str) -> bool:
        if len(s) != 10 or not s.isdigit():
            return False
        d = [int(c) for c in s]
        doubled = sum((2 * x) % 10 + (2 * x) // 10 for x in d[0:9:2])
        total = doubled + sum(d[1:9:2]) + 24
        return (10 - total % 10) % 10 == d[9]

    values = [f"{n:010d}" for n in range(1234567880, 1234567920)]
    got = _eval(spark, npi_is_valid, values)
    for v in values:
        assert got[v] == py_npi(v), v
