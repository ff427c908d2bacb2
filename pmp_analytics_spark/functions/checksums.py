"""Identifier checksum validation as higher-order-function expressions.

The reference validates DEA numbers with a mod-10 digit checksum
(awarxe_cleanup.py:57-75) and NPI numbers with a Luhn variant
(awarxe_cleanup.py:183-205), built from Polars list ops
(``str.split('') → gather_every → list.sum``). Here the same math compiles
to Spark higher-order functions (``filter``/``transform``/``aggregate``)
— all JVM-side, no UDFs, so they vectorize inside whole-stage codegen and
scale linearly with no Python serde.

DEA format: 2 letters + 7 digits; checksum over the 7 digits d1..d7:
    (d1+d3+d5) + 2*(d2+d4+d6) ≡ d7 (mod 10)

NPI format: 10 digits, Luhn with constant 24 added (the '80840' prefix
fold): sum(double-odd-digits with digit-fold) + sum(even digits) + 24,
check digit makes total ≡ 0 (mod 10).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def digits_of(c: Column | str) -> Column:
    """Split a string into an array of its digit characters as longs.
    (reference: awarxe_cleanup.py:61 ``str.split('') … cast(List(Int64))``)"""
    col = _col(c)
    only_digits = F.regexp_replace(col, r"\D", "")
    return F.transform(F.split(only_digits, "(?!$)"), lambda x: x.cast("long"))


def _sum_every_other(arr: Column, offset: int) -> Column:
    """Sum of elements at positions i where i % 2 == offset (0-based) —
    the reference's ``gather_every(2, offset) → list.sum``
    (awarxe_cleanup.py:66-67)."""
    kept = F.filter(arr, lambda x, i: i % 2 == F.lit(offset))
    return F.aggregate(kept, F.lit(0).cast("long"), lambda acc, x: acc + x)


def dea_is_valid(c: Column | str) -> Column:
    """Boolean: string passes DEA registration-number validation
    (pattern + mod-10 checksum; reference: awarxe_cleanup.py:46,57-75).

    Registrant first letter set per the reference regex
    (awarxe_cleanup.py:46): A,B,C,F,G,H,M,P,R.
    """
    col = F.upper(F.trim(_col(c)))
    pattern_ok = col.rlike(r"^[ABCFGHMPR][A-Z][0-9]{7}$")
    d = digits_of(col)
    odd = _sum_every_other(d, 0)   # d1,d3,d5 (+d7, subtracted below)
    even = _sum_every_other(d, 1)  # d2,d4,d6
    check = F.element_at(d, 7)
    checksum_ok = ((odd - check) + F.lit(2) * even) % 10 == check
    return F.when(pattern_ok, checksum_ok).otherwise(F.lit(False))


def npi_is_valid(c: Column | str) -> Column:
    """Boolean: 10-digit NPI passes the Luhn-variant checksum
    (reference: awarxe_cleanup.py:167,183-205).

    First 9 digits: double every other starting at position 1 (0-based
    even indices), fold two-digit results (x div 10 + x mod 10 —
    reference list.eval at awarxe_cleanup.py:194), add undoubled digits
    and the constant 24; valid when (10 - total%10) % 10 == check digit.
    """
    col = F.trim(_col(c))
    pattern_ok = col.rlike(r"^[0-9]{10}$")
    d = digits_of(col)
    first9 = F.slice(d, 1, 9)
    doubled = F.aggregate(
        F.filter(first9, lambda x, i: i % 2 == F.lit(0)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + (2 * x) % 10 + F.floor((2 * x) / 10),
    )
    undoubled = _sum_every_other(first9, 1)
    total = doubled + undoubled + F.lit(24)
    check = F.element_at(d, 10)
    checksum_ok = (10 - total % 10) % 10 == check
    return F.when(pattern_ok, checksum_ok).otherwise(F.lit(False))


def luhn_mod10_ok(c: Column | str) -> Column:
    """Plain Luhn mod-10 over all digits (rightmost is the check digit) —
    generic building block for card/identifier validation."""
    col = F.trim(_col(c))
    d = F.reverse(digits_of(col))
    total = F.aggregate(
        F.zip_with(
            d,
            F.sequence(F.lit(1), F.size(d)),
            lambda x, i: F.when(i % 2 == 0, (2 * x) % 10 + F.floor((2 * x) / 10)).otherwise(x),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (F.size(d) > 1) & (total % 10 == 0)
