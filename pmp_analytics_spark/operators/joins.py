"""Join patterns.

The reference's signature relational shapes (SURVEY.md §2.4): anti-join as
exclusion (6 uses — delinquent_data_submitters.py:90,453; exclude_ndcs.py:22),
driver-list membership rewritten as broadcast semi-join (unreg_presc.py:119
``is_in(collected_list)`` — an anti-pattern at 100 TB; the key set must never
transit the driver), fuzzy similarity join with a blocking key (od.py:81-86),
and the two-stage exact-then-fallback matcher (unreg_presc.py:278-296).

Scale posture: exclusion/membership sides here are dimension-sized → we hint
``broadcast()`` so Catalyst plans a BroadcastHashJoin with no shuffle of the
fact side. The fuzzy join NEVER degenerates to a cross join — the equi-join
on the blocking key bounds the candidate set, and the similarity UDF runs
only on candidates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pmp_analytics_spark.functions.similarity import jw_similarity
from pmp_analytics_spark.operators.partitioning import ensure_parallelism


def anti_join(left: DataFrame, right: DataFrame, on: Sequence[str] | Column, broadcast_right: bool = True) -> DataFrame:
    """EXCEPT-by-key (reference: 'anti' joins, delinquent_data_submitters.py:90)."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how="left_anti")


def semi_join(left: DataFrame, right: DataFrame, on: Sequence[str] | Column, broadcast_right: bool = True) -> DataFrame:
    """Membership filter by key — replaces the reference's
    ``is_in(driver_collected_list)`` (unreg_presc.py:107,119) with a
    broadcast semi-join: the membership set stays distributed, the fact
    table is filtered map-side with zero shuffle."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how="left_semi")


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    blocking_on: Sequence[str],
    left_text: str,
    right_text: str,
    threshold: float = 0.8,
    sim_col: str = "similarity",
) -> DataFrame:
    """Blocked fuzzy similarity join (reference: od.py:79-105 — equi-join
    on date-of-birth, then keep pairs with Jaro-Winkler ≥ threshold).

    The blocking equi-join is the scale story: candidates = pairs sharing
    the blocking key, so cost is sum over keys of |L_k|·|R_k|, not |L|·|R|.
    The Arrow-batched JW UDF runs post-join on candidates only, with the
    left side spread to full parallelism first — a small-file scan must
    not serialize the Python stage onto one core.
    """
    joined = ensure_parallelism(left).join(right, on=list(blocking_on), how="inner")
    sim = jw_similarity(F.col(left_text), F.col(right_text))
    return joined.withColumn(sim_col, sim).where(F.col(sim_col) >= F.lit(threshold))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """As-of join: attach to each left row the single right row with the
    greatest ``right_ts`` <= ``left_ts`` (direction='backward'; 'forward'
    takes the smallest >=) within the same ``on`` key. Left-join
    semantics: unmatched left rows survive with null right columns.

    Spark has no native as-of join, but the semantics decompose into
    built-in ops with the union+ordered-window formulation:

        union(left tagged 1, right tagged 0)
        → window last(right_payload ignoreNulls) over
          (partition by key, order by ts, tag; rows unbounded preceding)
        → keep tag=1 rows.

    Scale: ONE shuffle on the join key (the same shuffle any join would
    pay) and one in-partition sort — never a range-explosion join or a
    per-key collect. Skewed keys behave exactly like a skewed groupBy
    (salting applies if needed). This beats the naive
    "join on key + ts inequality, then row_number" plan, whose candidate
    set is O(|L_k|·|R_k|) per key before the filter.

    Right rows tying on (key, right_ts) are disambiguated by preferring
    the later one in the union's sort; make ties impossible upstream
    (dedup right on (key, ts)) when exact determinism matters.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    keys = list(on)
    payload_cols = [c for c in right.columns if c not in keys]
    overlap = set(payload_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"right payload columns collide with left: {sorted(overlap)}")

    l2 = left.withColumn("__asof_t", F.col(left_ts)).withColumn("__is_left", F.lit(1))
    r2 = right.select(
        *keys,
        F.col(right_ts).alias("__asof_t"),
        F.lit(0).alias("__is_left"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__asof_p"),
    )
    both = l2.unionByName(r2, allowMissingColumns=True)

    if direction == "backward":
        # right row sorts before a left row at the same instant (<= match)
        w = Window.partitionBy(*keys).orderBy(F.asc("__asof_t"), F.asc("__is_left"))
        matched = F.last("__asof_p", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = Window.partitionBy(*keys).orderBy(F.desc("__asof_t"), F.asc("__is_left"))
        matched = F.last("__asof_p", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    out = both.withColumn("__m", matched).where(F.col("__is_left") == 1)
    if tolerance_seconds is not None:
        gap = F.abs(
            F.col(left_ts).cast("double") - F.col("__m").getField(right_ts).cast("double")
        )
        out = out.withColumn(
            "__m", F.when(gap <= F.lit(float(tolerance_seconds)), F.col("__m"))
        )
    for c in payload_cols:
        out = out.withColumn(c, F.col("__m").getField(c))
    return out.drop("__asof_t", "__is_left", "__m", "__asof_p")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    lo: Column,
    hi: Column,
) -> DataFrame:
    """Interval join: left rows matched to right rows whose [lo, hi)
    interval contains ``left_ts``, blocked by the ``on`` equi-key.

    The equi-key IS the scale story: Catalyst plans a hash join on the
    key with the range predicate as a post-join filter, so cost is
    Σ_k |L_k|·|R_k| — bounded by the key's selectivity, never |L|·|R|.
    Without a blocking key, prefer bucketizing the time axis and
    equi-joining on the bucket (the standard interval-join rewrite).
    """
    cond = F.col(left_ts) >= lo
    return left.join(right, on=list(on), how="inner").where(cond & (F.col(left_ts) < hi))


def two_stage_match(
    left: DataFrame,
    right: DataFrame,
    exact_key: str,
    fallback_left_key: Column,
    fallback_right_key: Column,
    fallback_filter: Column | None = None,
) -> DataFrame:
    """Exact-key join, then re-match the leftovers on a cleaned fallback
    key, union the results (reference: unreg_presc.py:278-296 — DEA join,
    anti-join leftovers re-joined on normalized name + containment filter).
    """
    exact = left.join(right, on=exact_key, how="inner")
    leftovers = left.join(right.select(exact_key).distinct(), on=exact_key, how="left_anti")
    fb = leftovers.withColumn("__fb_key", fallback_left_key).join(
        right.withColumn("__fb_key", fallback_right_key).drop(exact_key),
        on="__fb_key",
        how="inner",
    )
    if fallback_filter is not None:
        fb = fb.where(fallback_filter)
    return exact.unionByName(fb.drop("__fb_key"), allowMissingColumns=True)
