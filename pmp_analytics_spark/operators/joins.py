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


def edit_distance_join(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """Self edit-distance similarity join: distinct (id_a, id_b, dist)
    pairs with ``levenshtein(text_a, text_b) <= max_dist`` and
    id_a < id_b — the entity-resolution primitive (Ed-Join family:
    Xiao et al., VLDB 2008) next to the Jaro-Winkler blocked join and
    the Jaccard prefix join.

    LOSSLESS blocking, never |D|²: an edit operation destroys at most
    ``q`` of a string's POSITIONAL q-grams, so two strings within
    distance k with at least ``k*q + 1`` positional grams each share a
    gram VALUE among the first ``k*q + 1`` of each side's gram multiset
    under any GLOBAL total order (the multiset prefix-filter lemma;
    duplicates kept — distinct-ifying weakens the count bound on
    repetitive strings). The order used is (corpus gram frequency ASC,
    gram) — rarest-first minimizes bucket sizes exactly like the
    Jaccard prefix join. Strings SHORTER than ``(k+1)*q`` grams-wise
    carry no guarantee (they can be within distance k with zero shared
    grams, e.g. 'aac'~'bcc'); every string short enough to be such a
    pair's LONGER side (len < (k+1)*q + k) additionally lands in one
    dedicated short bucket — a documented degenerate zone that is
    dimension-bounded in real corpora (names/titles exceed the cutoff).
    Candidates bucket-join on gram value, pre-filter on
    ``abs(len_a - len_b) <= k`` (length pruning), then verify with the
    built-in JVM ``levenshtein`` — whole-stage codegen, no Python.

    Scale: one pass to gram + one gram-frequency aggregate (broadcast
    back), one shuffle on the uniform gram key, verification on
    candidate pairs only.
    """
    prefix_len = max_dist * q + 1
    short_cutoff = (max_dist + 1) * q + max_dist  # longer side of any short pair
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__t"),
        F.length(text_col).alias("__len"),
    ).where(F.col("__t").isNotNull())
    grams = base.select(
        "__id",
        F.explode(
            F.when(
                F.col("__len") < q, F.array(F.col("__t"))
            ).otherwise(
                F.expr(
                    f"transform(sequence(1, __len - {q - 1}), "
                    f"i -> substring(__t, i, {q}))"
                )
            )
        ).alias("g"),
    )
    gfreq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("__gf"))
    w = Window.partitionBy("__id").orderBy(F.asc("__gf"), F.asc("g"))
    shorts = base.where(F.col("__len") < short_cutoff).select(
        "__id", F.lit("\x01SHORT").alias("g")
    )
    prefix = (
        grams.join(F.broadcast(gfreq), "g")
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= prefix_len)
        .select("__id", "g")
        .unionByName(shorts)
        .distinct()
    )
    cand = (
        prefix.select(F.col("__id").alias("id_a"), "g")
        .join(prefix.select(F.col("__id").alias("id_b"), "g"), "g")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = base.select(
        F.col("__id").alias("id_a"),
        F.col("__t").alias("__ta"),
        F.col("__len").alias("__la"),
    )
    b = base.select(
        F.col("__id").alias("id_b"),
        F.col("__t").alias("__tb"),
        F.col("__len").alias("__lb"),
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .where(F.abs(F.col("__la") - F.col("__lb")) <= max_dist)
        .withColumn("dist", F.levenshtein("__ta", "__tb"))
        .where(F.col("dist") <= max_dist)
        .select("id_a", "id_b", F.col("dist").cast("long").alias("dist"))
    )
