"""SQL entry path: the engine's declared queries are reachable through
``spark.sql`` over registered views, not only the DataFrame API.

Each case runs the query's ANSI oracle SQL TEXT directly in Spark and
asserts row-for-row equality with the DataFrame pipeline — proving (a)
the SQL strings really are ANSI (the same text the DuckDB gate runs),
and (b) a SQL-first user of the reference could port their queries as
plain SQL against the registered tables and get identical results.
Duck-specific oracles (LIST_* lambdas, QUALIFY) are exercised by the
DuckDB gate instead; this list is the ANSI-portable subset.
"""

from __future__ import annotations

import math

import pytest

from pmp_analytics_spark.queries import all_oracles, all_queries
from pmp_analytics_spark.sources.reader import TABLES, load_table

SF = "/root/testdata/sf0.001"

PORTABLE = [
    "pricing_summary",
    "revenue_rollup",
    "top_customers_by_spend",
    "nation_revenue_share",
    "scorecard_summary",
    "customer_spend_deciles",
    "shipping_priority",
    "repeat_customers",
    # MV maintenance: the oracle text is the FULL RECOMPUTE, the
    # DataFrame pipeline is the incremental refresh — running both in
    # Spark cross-checks the refresh against Spark's own SQL engine too
    "orders_mv_incremental",
    "orders_mv_minmax",
]


@pytest.fixture(scope="module")
def sql_views(spark):
    for t in TABLES:
        load_table(spark, SF, t).createOrReplaceTempView(t)
    yield
    for t in TABLES:
        spark.catalog.dropTempView(t)


def _norm(rows):
    out = []
    for r in rows:
        d = r.asDict()
        out.append(
            tuple(
                (k, round(v, 9) if isinstance(v, float) and not math.isnan(v) else v)
                for k, v in sorted(d.items())
            )
        )
    return sorted(out)


@pytest.mark.parametrize("name", PORTABLE)
def test_oracle_sql_runs_in_spark_and_matches(spark, sql_views, name):
    df_api = all_queries()[name](spark, SF)
    via_sql = spark.sql(all_oracles()[name])
    assert sorted(c.lower() for c in via_sql.columns) == sorted(
        c.lower() for c in df_api.columns
    )
    assert _norm(via_sql.collect()) == _norm(df_api.collect())
