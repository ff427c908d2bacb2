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

# Order matters: SSN before PHONE (both match ddd-dd…), EMAIL first so
# digits inside addresses are not half-eaten by the number patterns.
_SCRUB_ORDER = [
    (EMAIL_RE, "[EMAIL]"),
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
