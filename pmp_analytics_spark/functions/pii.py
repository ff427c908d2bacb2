"""PII detection and redaction expressions.

A training-data pipeline scrubs personally identifiable information from
text before the corpus ships. The reference's closest analog is its
masked-extract discipline (check_masked.py's month-over-month audit of a
pre-masked extract); here masking itself is an engine operator.

All patterns are pure JVM `regexp_replace` / `regexp_extract_all` — no
Python in the row path — and are written in the regex subset shared by
Java (Spark) and RE2 (DuckDB): character classes, bounded repetition,
alternation; no lookaround, no backreferences. The same pattern strings
feed the SQL oracle, so redaction is bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared Java/RE2 regex dialect — see module docstring.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\d{3}-\d{3}-\d{4}|\d{3}-\d{4}"
SSN_RE = r"\d{3}-\d{2}-\d{4}"
CARD_RE = r"\b\d{13,16}\b"  # PAN candidates; Luhn separates real ones

# Order matters: SSN before PHONE (both match ddd-dd…), EMAIL first so
# digits inside addresses are not half-eaten by the number patterns,
# CARD before the dash-delimited numbers (long bare digit runs).
_SCRUB_ORDER = [
    (EMAIL_RE, "[EMAIL]"),
    (CARD_RE, "[CARD]"),
    (SSN_RE, "[SSN]"),
    (PHONE_RE, "[PHONE]"),
]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def scrub_pii(c: Column | str) -> Column:
    """Redact emails, SSNs, and phone numbers (in that order)."""
    out = _col(c)
    for pattern, token in _SCRUB_ORDER:
        out = F.regexp_replace(out, pattern, token)
    return out


def count_pattern(c: Column | str, pattern: str) -> Column:
    """Number of non-overlapping matches of ``pattern`` (BIGINT)."""
    return F.size(F.regexp_extract_all(_col(c), F.lit(pattern), 0)).cast("long")


def duck_scrub_sql(expr: str) -> str:
    """The DuckDB expression applying the identical scrub order."""
    out = expr
    for pattern, token in _SCRUB_ORDER:
        out = f"REGEXP_REPLACE({out}, '{pattern}', '{token}', 'g')"
    return out


def _luhn_terms(s: Column) -> Column:
    """Per-digit Luhn contributions of a digit string: position j from
    the RIGHT (1-based) doubles when j is even, with 9-subtraction.
    Pure JVM HOF (sequence + transform over substr) — no Python."""
    n = F.length(s)

    def term(j: Column) -> Column:
        d = F.substr(s, n - j + 1, F.lit(1)).cast("int")
        dbl = d * 2
        return F.when(j % 2 == 0, F.when(dbl > 9, dbl - 9).otherwise(dbl)).otherwise(d)

    return F.transform(F.sequence(F.lit(1), n), term)


def luhn_valid(c: Column | str) -> Column:
    """TRUE iff the digit string passes the Luhn mod-10 check (ISO/IEC
    7812) — the filter that separates real card numbers from arbitrary
    13-16 digit runs, cutting PII false positives on ids/timestamps.
    NULL input yields NULL (callers decide the policy)."""
    s = _col(c)
    total = F.aggregate(_luhn_terms(s), F.lit(0), lambda a, x: a + x)
    # Guard the empty string explicitly: Spark's sequence(1, 0) DESCENDS
    # ([1, 0]) rather than returning [], which would feed garbage
    # positions into the digit walk.
    return F.when(F.length(s) == 0, F.lit(False)).otherwise(total % 10 == 0)


def luhn_check_digit(payload: Column | str) -> Column:
    """The check digit that makes ``payload || digit`` Luhn-valid: in
    the full number every payload digit shifts one position left, so
    doubling applies at ODD positions-from-right of the payload."""
    s = _col(payload)
    n = F.length(s)

    def term(j: Column) -> Column:
        d = F.substr(s, n - j + 1, F.lit(1)).cast("int")
        dbl = d * 2
        return F.when(j % 2 == 1, F.when(dbl > 9, dbl - 9).otherwise(dbl)).otherwise(d)

    total = F.aggregate(
        F.transform(F.sequence(F.lit(1), n), term), F.lit(0), lambda a, x: a + x
    )
    return (F.lit(10) - total % 10) % 10


def duck_luhn_sum_sql(expr: str, length: int, payload_mode: bool) -> str:
    """Unrolled DuckDB Luhn sum over a FIXED-length digit string (the
    oracle side: fixture lengths are compile-time constants, so the sum
    unrolls to `length` literal terms — no lambdas, no correlated
    UNNEST). ``payload_mode`` doubles odd positions-from-right (check-
    digit derivation); otherwise even positions (validation)."""
    parity = 1 if payload_mode else 0
    terms = []
    for j in range(1, length + 1):
        d = f"CAST(SUBSTRING({expr}, {length - j + 1}, 1) AS INT)"
        if j % 2 == parity:
            terms.append(f"(CASE WHEN 2*{d} > 9 THEN 2*{d} - 9 ELSE 2*{d} END)")
        else:
            terms.append(d)
    return "(" + " + ".join(terms) + ")"
