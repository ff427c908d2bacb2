"""Dataset-diff utility — the reference's month-over-month extract check
(check_masked.py:48-75) as a reusable, assertable operator: schema
comparison, row-count drift, per-column bounds, and a deterministic
sample, computed in ONE aggregation pass per side (the reference makes
separate min()/max()/count passes; at 100 TB each pass is a full scan).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pmp_analytics_spark.operators.sample import deterministic_sample


@dataclass
class DatasetDiff:
    columns_added: list[str]
    columns_removed: list[str]
    rows_old: int
    rows_new: int
    pct_change: float
    bounds_old: dict[str, tuple] = field(default_factory=dict)
    bounds_new: dict[str, tuple] = field(default_factory=dict)
    sample_new: list[tuple] = field(default_factory=list)

    @property
    def schema_matches(self) -> bool:
        return not self.columns_added and not self.columns_removed


def _stats(df: DataFrame, bound_cols: list[str]) -> tuple[int, dict[str, tuple]]:
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in bound_cols:
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
    row = df.agg(*aggs).collect()[0]
    return row["__n"], {c: (row[f"__min_{c}"], row[f"__max_{c}"]) for c in bound_cols}


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    bound_cols: list[str] | None = None,
    sample_n: int = 20,
    sample_key: str | None = None,
) -> DatasetDiff:
    """Compare two dataset versions (reference: check_masked.py:48-75 —
    column-set equality, row-count %% change, min/max date bounds, and an
    eyeball sample; the sample here is deterministic, not ``.sample``)."""
    old_cols, new_cols = set(old.columns), set(new.columns)
    shared_bounds = [c for c in (bound_cols or []) if c in old_cols and c in new_cols]
    rows_old, bounds_old = _stats(old, [c for c in shared_bounds if c in old_cols])
    rows_new, bounds_new = _stats(new, shared_bounds)
    sample: list[tuple] = []
    if sample_n and sample_key and sample_key in new_cols:
        sample = [tuple(r) for r in deterministic_sample(new, sample_key, sample_n).collect()]
    return DatasetDiff(
        columns_added=sorted(new_cols - old_cols),
        columns_removed=sorted(old_cols - new_cols),
        rows_old=rows_old,
        rows_new=rows_new,
        pct_change=round((rows_new - rows_old) * 100.0 / rows_old, 2) if rows_old else float("inf"),
        bounds_old=bounds_old,
        bounds_new=bounds_new,
        sample_new=sample,
    )


def assert_compatible(diff: DatasetDiff, max_pct_change: float = 25.0) -> None:
    """Fail-fast gate in the spirit of the reference's human sanity check
    (delinquent_data_submitters.py:144-147), automated: schema must match
    and row drift must stay inside the tolerance."""
    problems = []
    if not diff.schema_matches:
        problems.append(f"schema drift: +{diff.columns_added} -{diff.columns_removed}")
    if abs(diff.pct_change) > max_pct_change:
        problems.append(f"row count drifted {diff.pct_change}% ({diff.rows_old} -> {diff.rows_new})")
    if problems:
        raise AssertionError("; ".join(problems))
