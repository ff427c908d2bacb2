"""Physical-plan audit utilities.

The engine's performance posture is enforced, not hoped for: tests assert
that the plans Catalyst produces are the plans we designed for — dimension
joins broadcast (no fact-side shuffle), filters and column pruning reach
the parquet scan, top-K compiles to TakeOrderedAndProject (per-partition
heaps, no full sort), and nothing degenerates into a cartesian product.
A plan regression (e.g. a broadcast silently becoming a sort-merge join
after a refactor) fails CI instead of surfacing as a 100 TB incident.

These helpers parse ``df.explain`` output rather than walking JVM plan
objects — stable across Spark versions and exactly what an engineer reads.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in physical_plan(df)


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in physical_plan(df)


def has_pushed_filters(df: DataFrame) -> bool:
    """True when the parquet scan carries pushed-down predicates."""
    plan = physical_plan(df)
    for line in plan.splitlines():
        if "PushedFilters:" in line and "PushedFilters: []" not in line:
            return True
    return False


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names the parquet scan actually reads (pruning check)."""
    plan = physical_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            schema = line.split("ReadSchema:", 1)[1].strip()
            inner = schema[schema.find("<") + 1 : schema.rfind(">")]
            for field in inner.split(","):
                name = field.split(":")[0].strip()
                if name:
                    cols.append(name)
    return cols


def count_exchanges(df: DataFrame) -> int:
    """Number of distinct shuffle Exchange operators in the plan (each is
    a full data re-distribution — the unit of cost to minimize).

    Counts unique numbered nodes from formatted explain — a cached
    subtree's plan text is repeated once per consumer in explain output
    and must not be double-counted.
    """
    import re

    plan = physical_plan(df)
    seen = set()
    for m in re.finditer(r"^\((\d+)\)\s+(\w+)", plan, re.MULTILINE):
        if m.group(2) == "Exchange":
            seen.add(m.group(1))
    return len(seen)


def assert_no_cartesian_product(df: DataFrame) -> None:
    plan = physical_plan(df)
    if "CartesianProduct" in plan:
        raise AssertionError("plan contains a CartesianProduct:\n" + plan)


def unpartitioned_window_count(df: DataFrame) -> int:
    """Number of window operators whose partition spec is EMPTY — the
    plan shape that funnels every row into one reducer ("No Partition
    Defined for Window operation" at runtime), a 100 TB incident that
    looks fine at test scale.

    Counted by traversing the pre-AQE physical plan JVM-side and asking
    each Window node for ``partitionSpec().isEmpty()`` — the formatted
    EXPLAIN text has no reliable marker (an unpartitioned window prints
    the same node header, and ``SinglePartition`` exchanges also serve
    legitimate global aggregates)."""
    stack = [df._jdf.queryExecution().sparkPlan()]
    count = 0
    while stack:
        node = stack.pop()
        name = node.getClass().getSimpleName()
        if name in ("WindowExec", "WindowInPandasExec", "WindowGroupLimitExec"):
            if node.partitionSpec().isEmpty():
                count += 1
        if name == "AdaptiveSparkPlanExec":
            # A cached subtree is reachable through innerChildren()
            # (InMemoryTableScan -> relation -> cachedPlan) but arrives
            # wrapped in a childless AdaptiveSparkPlanExec — unwrap to
            # the pre-adaptive plan or everything behind a .cache()
            # escapes the audit. (No separate cachedPlan() push: that
            # would traverse the cached subtree twice and double-count.)
            stack.append(node.inputPlan())
        children = node.children()
        for i in range(children.length()):
            stack.append(children.apply(i))
        inner = node.innerChildren()
        for i in range(inner.length()):
            stack.append(inner.apply(i))
    return count
