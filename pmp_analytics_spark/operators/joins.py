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

from pyspark.sql import Column, DataFrame
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
