"""Mergeable probabilistic sketches: HyperLogLog cardinality and
count-min frequency, built DETERMINISTICALLY on the repo's md5 hash
family so the full sketch state — registers and counters, not just the
final estimate — is replayable in ANSI SQL and hash-checkable against
the DuckDB oracle.

Why sketches at 100 TB: ``COUNT(DISTINCT key)`` shuffles every distinct
key to its reducer — at billions of keys that is the dominant exchange
of the whole job. An HLL register array is ``m`` small integers per
group REGARDLESS of input size: the map side folds every row into a
(register, rho) pair, partial-MAX combines locally, and the shuffle
carries at most ``m`` rows per group per partition. A count-min sketch
likewise bounds frequency state to ``d*w`` counters with map-side
partial SUM. Both are MERGEABLE (cell-wise max / sum), which is what
makes them partition-, micro-batch-, and day-rollup-friendly: partials
combine associatively, so the same sketch serves a 1000-executor batch
job and an incremental daily pipeline.

Determinism contract (what makes the oracle exact):
- the value hash is the repo-wide 60-bit md5 idiom
  (``conv(substring(md5(x), 1, 15), 16, 10)``), identical in DuckDB as
  ``CAST(('0x' || SUBSTRING(MD5(x), 1, 15)) AS BIGINT)``;
- HLL register math stays in exact BIGINT arithmetic: the harmonic-mean
  denominator is kept as the integer ``S = sum(2^(maxrho - M[j]))``
  (each term a dyadic integer, sum < 2^63), so cross-engine float
  summation order never enters; the only float ops are one literal
  division and (small-range branch) one ``ln`` — both deterministic to
  well below the harness's 9-decimal rounding;
- CMS is pure integer counting.

Published basis: Flajolet, Fusy, Gandouet, Meunier, "HyperLogLog: the
analysis of a near-optimal cardinality estimation algorithm" (AofA
2007), including the small-range linear-counting correction; Cormode &
Muthukrishnan, "An improved data stream summary: the count-min sketch
and its applications" (J. Algorithms 2005). Reference-repo parity
anchor: the scripts' exact ``n_unique`` / ``value_counts`` sanity
counts (e.g. /root/reference/awarxe_cleanup.py's distinct-count
checks) — the operators here are their bounded-state form at scales
where exact distinct is the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pmp_analytics_spark.functions.text import shingle_hash60

HASH_BITS = 60  # shingle_hash60's md5-substring idiom: uniform 60-bit int


def _hash60(col) -> F.Column:
    """Uniform 60-bit integer hash of a column's string form — the repo's
    one md5 idiom (``functions.text.shingle_hash60``), reused rather
    than re-stated so every sketch stays bit-compatible with the dedup
    and sampling operators (and with the DuckDB oracles)."""
    return shingle_hash60(col.cast("string"))


def _hash60_salted(i_col, key_col) -> F.Column:
    """Seed-salted variant: hash of ``"<i>|<key>"``. The i-th hash row of
    CMS and Bloom on BOTH the build and probe sides — one definition so
    the sides cannot drift (a probe hashing differently from its build
    would silently misalign buckets with no type error). Mirrored in SQL
    as ``MD5(CAST(i AS VARCHAR) || '|' || key)`` (cms_oracle_sql,
    queries/sketches.py's _BLOOM_POS)."""
    return shingle_hash60(F.concat_ws("|", i_col, key_col))


def hll_alpha(m: int) -> float:
    """Bias-correction constant from the HLL paper (m >= 128 form)."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str], p: int = 8
) -> DataFrame:
    """Per-group HLL register array as rows ``group_cols + (j, reg)``.

    ``j`` is the low ``p`` hash bits (register index); ``reg`` is the
    register value ``max(rho)`` where ``rho`` = 1 + leading zeros of the
    remaining ``HASH_BITS - p`` bits. Only OBSERVED registers appear;
    absent registers are implicitly 0 (``hll_cardinality`` accounts for
    them exactly). The groupBy partial-MAX combines map-side, so the
    shuffle is bounded by ``m = 2**p`` rows per group per partition —
    the whole point of the sketch at 100 TB.

    Register frames are MERGEABLE: union two of them and re-run
    ``max(reg)`` per (group, j) to combine days / sources / streams.
    """
    m = 1 << p
    width = HASH_BITS - p
    h = _hash60(F.col(key_col))
    w = F.shiftright(h, p)
    # bit_length via bin(): bin(0) = '0' (length 1), so w = 0 is its own
    # branch (all `width` bits are zero -> rho = width + 1).
    rho = F.when(w == 0, F.lit(width + 1)).otherwise(
        F.lit(width + 1) - F.length(F.bin(w))
    )
    return (
        df.where(F.col(key_col).isNotNull())
        .select(*group_cols, (h % m).alias("j"), rho.alias("rho"))
        .groupBy(*group_cols, "j")
        .agg(F.max("rho").alias("reg"))
    )


def hll_cardinality(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    p: int = 8,
    est_col: str = "est_distinct",
) -> DataFrame:
    """Per-group cardinality estimate ``group_cols + (est_col, <est_col>_s,
    <est_col>_v)`` — ``hll_finalize(hll_registers(...))``."""
    return hll_finalize(hll_registers(df, key_col, group_cols, p), group_cols, p, est_col)


def hll_finalize(
    regs: DataFrame,
    group_cols: list[str],
    p: int = 8,
    est_col: str = "est_distinct",
) -> DataFrame:
    """Estimate from a REGISTER frame (``hll_registers`` output, or any
    merge/union of such frames — e.g. a streaming query's register state
    table: register max is the streaming aggregation, this finalize runs
    batch-side over the drained state).

    The harmonic denominator is carried as the EXACT integer
    ``S = sum_j 2^(maxrho - M[j])`` (empty registers contribute
    ``2^maxrho``): every term is a power of two <= 2^(width+1) and the
    sum of ``m`` of them stays under 2^63, so no float enters until the
    single final division ``C / S`` with the precomputed literal
    ``C = alpha * m^2 * 2^maxrho``. Small-range correction per the HLL
    paper: if ``E_raw <= 2.5 m`` and some register is empty, fall back
    to linear counting ``m * ln(m / V)``. The raw/linear branch choice
    is a comparison of deterministic values, so both engines take the
    same branch on the same data.

    ``_s`` (the integer denominator) and ``_v`` (empty-register count)
    are exposed so a checker can hash-match the sketch STATE, not just
    the rounded estimate.
    """
    m = 1 << p
    maxrho = HASH_BITS - p + 1
    c_lit = hll_alpha(m) * m * m * float(1 << maxrho)
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {maxrho} - reg)")).alias("__s_obs"),
        F.count(F.lit(1)).alias("__n_obs"),
    )
    # coalesce: a global (no-group) aggregate over an EMPTY register
    # frame still emits one row with a NULL sum — the empty set's S is
    # all-registers-empty, and the linear-counting branch then yields
    # exactly 0.
    s = (
        F.coalesce(F.col("__s_obs"), F.lit(0))
        + (F.lit(m) - F.col("__n_obs")) * F.lit(1 << maxrho)
    ).alias(f"{est_col}_s")
    v = (F.lit(m) - F.col("__n_obs")).alias(f"{est_col}_v")
    raw = F.lit(c_lit) / F.col(f"{est_col}_s").cast("double")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / F.col(f"{est_col}_v"))
    est = F.round(
        F.when((raw <= F.lit(2.5 * m)) & (F.col(f"{est_col}_v") > 0), linear).otherwise(
            raw
        ),
        2,
    ).alias(est_col)
    return agg.select(*group_cols, s, v).select(*group_cols, est, f"{est_col}_s", f"{est_col}_v")


def hll_oracle_sql(
    key_expr: str,
    group_cols: list[str],
    table_sql: str,
    p: int = 8,
    est_col: str = "est_distinct",
) -> str:
    """DuckDB replay of ``hll_cardinality`` — same hash, same integer
    register math, same literals, same branch predicate. ``key_expr``
    must already be the VARCHAR form of the key (mirroring the
    cast-to-string inside ``_hash60``)."""
    m = 1 << p
    maxrho = HASH_BITS - p + 1
    c_lit = repr(hll_alpha(m) * m * m * float(1 << maxrho))
    g = ", ".join(group_cols)
    g_pref = f"{g}, " if g else ""
    return f"""
    WITH __h AS (
        SELECT {g_pref}
               CAST(('0x' || SUBSTRING(MD5({key_expr}), 1, 15)) AS BIGINT) AS hv
        FROM {table_sql}
        WHERE {key_expr} IS NOT NULL
    ), __regs AS (
        SELECT {g_pref} hv % {m} AS j,
               MAX(CASE WHEN (hv >> {p}) = 0 THEN {maxrho}
                        ELSE {maxrho} - LENGTH(BIN(hv >> {p})) END) AS reg
        FROM __h GROUP BY {g_pref} j
    ), __agg AS (
        SELECT {g_pref}
               CAST(COALESCE(SUM(1::BIGINT << ({maxrho} - reg)), 0) AS BIGINT) AS s_obs,
               COUNT(*) AS n_obs
        FROM __regs GROUP BY {g if g else "ALL"}
    ), __fin AS (
        SELECT {g_pref}
               s_obs + ({m} - n_obs) * (1::BIGINT << {maxrho}) AS {est_col}_s,
               {m} - n_obs AS {est_col}_v
        FROM __agg
    )
    SELECT {g_pref}
           ROUND(CASE WHEN {c_lit} / CAST({est_col}_s AS DOUBLE) <= {2.5 * m}
                       AND {est_col}_v > 0
                      THEN {float(m)} * LN({float(m)} / {est_col}_v)
                      ELSE {c_lit} / CAST({est_col}_s AS DOUBLE) END,
                 2) AS {est_col},
           {est_col}_s, {est_col}_v
    FROM __fin
    """


def kmv_hash_frame(df: DataFrame, key_col: str, group_cols: list[str]) -> DataFrame:
    """``(group_cols..., hv)`` stream of 60-bit key hashes — the JVM-side
    front half shared by batch ``kmv_sketch`` and the streaming bottom-k
    state operator (``streaming.stateful.kmv_bottomk_stream``): one hash
    definition, so batch and streaming sketches stay bit-compatible."""
    return df.where(F.col(key_col).isNotNull()).select(
        *group_cols, _hash60(F.col(key_col)).alias("hv")
    )


def kmv_sketch(
    df: DataFrame, key_col: str, group_cols: list[str], k: int = 256
) -> DataFrame:
    """Per-group KMV (bottom-k / k-minimum-values) distinct sketch as
    rows ``group_cols + (hv, r)`` — the ``k`` SMALLEST distinct 60-bit
    hashes of the key, rank ``r`` in ascending hash order.

    What KMV adds over HLL: the sketch is a uniform SAMPLE of the key
    set's hash space, so two groups' sketches support SET-OPERATION
    estimates (union via merged bottom-k, intersection via the matching
    fraction inside the merged sketch — Beyer et al., "On synopses for
    distinct-value estimation under multiset operations", SIGMOD 2007).
    HLL registers can only union.

    Scale shape: one shuffle on the uniform (group, hash) key whose
    map-side partial dedupe bounds it to per-partition-distinct rows,
    then the repo's two-window exact bottom-k cut (the
    similarity_search pre-cut pattern): a (partition, group) local rank
    bounds the global per-group window to O(partitions·k) rows, so no
    reducer ever sorts a group's full distinct-hash stream. Sketches
    MERGE by unioning rows, re-deduping on hv, and re-ranking to k.
    """
    distinct = kmv_hash_frame(df, key_col, group_cols).distinct()
    w_local = Window.partitionBy("__pid", *group_cols).orderBy(F.asc("hv"))
    pre = (
        distinct.withColumn("__pid", F.spark_partition_id())
        .withColumn("__lr", F.row_number().over(w_local))
        .where(F.col("__lr") <= k)
        .drop("__pid", "__lr")
    )
    w_glob = Window.partitionBy(*group_cols).orderBy(F.asc("hv"))
    return pre.withColumn("r", F.row_number().over(w_glob)).where(F.col("r") <= k)


def kmv_cardinality(
    sketch: DataFrame,
    group_cols: list[str],
    k: int,
    est_col: str = "est_distinct",
) -> DataFrame:
    """Distinct-count estimate per group from a ``kmv_sketch`` frame:
    ``(k-1) * 2^HASH_BITS / h_(k)`` when the group filled its sketch
    (Bar-Yossef et al.'s unbiased form), EXACT count when it holds fewer
    than ``k`` hashes (the sketch then IS the distinct hash set). Both
    engines take the same branch: the predicate compares exact integers.
    Emits ``n_seen`` (sketch fill) and ``hv_k`` (the k-th hash, 0 when
    unfilled) so the oracle pins sketch state, not just the estimate."""
    num = float(k - 1) * float(1 << HASH_BITS)
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_seen"),
        F.max(F.when(F.col("r") == k, F.col("hv"))).alias("__hk"),
    )
    est = F.round(
        F.when(F.col("n_seen") < k, F.col("n_seen").cast("double")).otherwise(
            F.lit(num) / F.col("__hk").cast("double")
        ),
        2,
    )
    return agg.select(
        *group_cols,
        est.alias(est_col),
        "n_seen",
        F.coalesce(F.col("__hk"), F.lit(0)).alias("hv_k"),
    )


def cms_sketch(df: DataFrame, key_col: str, d: int = 4, w: int = 512) -> DataFrame:
    """Count-min sketch of ``key_col``'s frequencies as rows
    ``(i, bucket, cnt)`` — ``d`` hash rows of ``w`` counters.

    The per-row fan-out to ``d`` (row, bucket) pairs is MAP-LOCAL
    (``explode`` of a literal array, no shuffle); the groupBy's partial
    SUM collapses each partition to at most ``d*w`` cells before the
    exchange, so shuffle volume is bounded by sketch size — not input
    size. Sketches merge by unioning and re-summing per cell.
    """
    pairs = df.where(F.col(key_col).isNotNull()).select(
        F.col(key_col).cast("string").alias("__k"),
        F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("i"),
    )
    bucket = _hash60_salted(F.col("i"), F.col("__k")) % w
    return (
        pairs.select("i", bucket.alias("bucket"))
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 512,
    est_col: str = "est_count",
) -> DataFrame:
    """Point-query the sketch for each candidate key: the classic
    ``min_i sketch[i][h_i(key)]`` upper bound (never under-counts).

    The sketch side is at most ``d*w`` rows — explicitly broadcast, so
    the estimate is a map-side join however large the candidate set is.
    Empty cells are not materialized as sketch rows, so the probe LEFT
    joins and coalesces a missing cell to 0 — a key the sketch never saw
    correctly estimates 0 instead of vanishing (all cells empty) or
    over-reporting (some cells empty). NULL candidate keys are excluded,
    matching the build side.
    """
    cand = candidates.where(F.col(key_col).isNotNull()).select(
        F.col(key_col),
        F.col(key_col).cast("string").alias("__k"),
        F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("i"),
    )
    bucket = _hash60_salted(F.col("i"), F.col("__k")) % w
    return (
        cand.select(key_col, "i", bucket.alias("bucket"))
        .join(F.broadcast(sketch), ["i", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(est_col))
    )


def histogram_bins(
    df: DataFrame, value_col: str, bins: int = 128
) -> tuple[DataFrame, DataFrame]:
    """Equi-width histogram of ``value_col``: returns ``(bin_counts,
    bounds)`` where bin_counts is ``(bin, cnt)`` (at most ``bins`` rows —
    the mergeable quantile state: bin counts SUM across partitions /
    days / sources) and bounds is the 1-row ``(mn, mx, n)`` frame the
    binning derives from.

    Two narrow passes: a scalar min/max/count agg (broadcast back), then
    the bin groupBy whose map-side partial collapses each partition to
    <= bins rows before the exchange. The quantile estimate this feeds
    (``histogram_quantiles``) replaces a full sort / exact percentile's
    per-group value shuffle with ``bins`` integers — the classic
    DB-statistics histogram, deterministic by construction (identical
    float ops both engines, no rounding games needed).
    """
    vals = df.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("double").alias("v")
    )
    bounds = vals.agg(
        F.min("v").alias("mn"), F.max("v").alias("mx"), F.count(F.lit(1)).alias("n")
    )
    binned = vals.crossJoin(F.broadcast(bounds)).select(
        F.when(F.col("mx") == F.col("mn"), F.lit(0))  # degenerate: one bin
        .otherwise(
            F.least(
                F.floor(
                    (F.col("v") - F.col("mn")) / (F.col("mx") - F.col("mn")) * bins
                ),
                F.lit(bins - 1),
            )
        )
        .cast("long")
        .alias("bin")
    )
    return binned.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt")), bounds


def histogram_quantiles(
    bin_counts: DataFrame,
    bounds: DataFrame,
    qs: list[float],
    bins: int = 128,
) -> DataFrame:
    """Interpolated quantile estimates from histogram state: rows
    ``(q, est_value)``. The cumulative count uses a bounded
    triangle self-join over the <= ``bins``-row frame (broadcast, no
    single-partition window, no warning-path WindowExec); the estimate
    linearly interpolates inside the first bin whose cumulative count
    reaches ``q*n``: ``mn + (bin + (q*n - prev_cum)/cnt) * width`` with
    one shared op order so an oracle replays it bit-for-bit."""
    spark = bin_counts.sparkSession
    a = bin_counts.select(F.col("bin"), F.col("cnt"))
    b = bin_counts.select(F.col("bin").alias("b2"), F.col("cnt").alias("c2"))
    cum = (
        a.join(F.broadcast(b), F.col("b2") <= F.col("bin"))
        .groupBy("bin", "cnt")
        .agg(F.sum("c2").alias("cum"))
    )
    qdf = spark.range(1).select(
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    )
    targets = qdf.crossJoin(F.broadcast(bounds)).select(
        "q", "mn", "mx", "n", (F.col("q") * F.col("n").cast("double")).alias("target")
    )
    pick = (
        targets.join(
            F.broadcast(cum), F.col("cum") >= F.col("target"), "inner"
        )
        .groupBy("q", "mn", "mx", "n", "target")
        .agg(F.min("bin").alias("bin"))
    )
    width = (F.col("mx") - F.col("mn")) / bins
    frac = (F.col("target") - (F.col("cum") - F.col("cnt")).cast("double")) / F.col(
        "cnt"
    ).cast("double")
    return (
        pick.join(F.broadcast(cum), "bin")
        .select(
            "q",
            (F.col("mn") + (F.col("bin").cast("double") + frac) * width).alias(
                "est_value"
            ),
        )
    )


def bloom_build(
    df: DataFrame, key_col: str, mbits: int = 1 << 16, d: int = 6
) -> DataFrame:
    """Bloom-filter membership sketch as a DISTINCT set-bit-position
    frame (at most ``mbits`` rows regardless of input size): each key
    sets ``d`` md5-family positions. The classic ingest pre-filter at
    100 TB — probe a new batch against the corpus filter CHEAPLY (a
    broadcast join), pay the exact dedup join only for bloom hits.
    One-sided like CMS: false positives possible, false negatives never.
    Filters MERGE by unioning position frames and re-distincting
    (day-over-day corpus growth never rebuilds from scratch).
    (Bloom, CACM 1970; the position-list rendering keeps the structure
    relational and the oracle replay exact.)"""
    keys = df.where(F.col(key_col).isNotNull()).select(
        F.col(key_col).cast("string").alias("__k"),
        F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("i"),
    )
    pos = _hash60_salted(F.col("i"), F.col("__k")) % mbits
    return keys.select(pos.alias("pos")).distinct()


def bloom_probe(
    positions: DataFrame,
    candidates: DataFrame,
    key_col: str,
    mbits: int = 1 << 16,
    d: int = 6,
    hit_col: str = "bloom_hit",
) -> DataFrame:
    """Membership probe: a candidate is a bloom hit iff ALL ``d`` of its
    positions are set. The position frame (<= ``mbits`` rows) broadcasts;
    the candidate side never shuffles for the probe.

    Candidates are de-duplicated (and NULLs dropped, matching the build
    side) BEFORE the d-way explode: the hit criterion counts matched
    rows against ``d``, so a duplicated candidate key — exactly the
    ingest-batch-with-repeated-text case this pre-filter exists for —
    would otherwise contribute 2d rows and report a FALSE NEGATIVE,
    breaking the filter's one-sided guarantee. (Two distinct probe
    positions colliding on one set bit still count twice — correct,
    since each of the d hashes matched.) The positions frame is
    re-distincted for the same reason: a merged-by-union filter must
    not double-match."""
    cand = (
        candidates.where(F.col(key_col).isNotNull())
        .select(key_col)
        .distinct()
        .select(
            F.col(key_col),
            F.col(key_col).cast("string").alias("__k"),
            F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("i"),
        )
    )
    pos = _hash60_salted(F.col("i"), F.col("__k")) % mbits
    bits = positions.select("pos").distinct().withColumn("__set", F.lit(1))
    return (
        cand.select(key_col, pos.alias("pos"))
        .join(F.broadcast(bits), "pos", "left")
        .groupBy(key_col)
        .agg((F.count("__set") == d).cast("int").alias(hit_col))
    )


def cms_oracle_sql(
    key_expr: str, table_sql: str, d: int = 4, w: int = 512, est_col: str = "est_count"
) -> str:
    """DuckDB replay of sketch-build + point-query for every distinct
    key of the input (pure integer arithmetic — exact hash match)."""
    return f"""
    WITH __pairs AS (
        SELECT CAST({key_expr} AS VARCHAR) AS k, i
        FROM {table_sql} CROSS JOIN GENERATE_SERIES(0, {d - 1}) AS __g(i)
        WHERE {key_expr} IS NOT NULL
    ), __cells AS (
        SELECT i,
               CAST(('0x' || SUBSTRING(MD5(CAST(i AS VARCHAR) || '|' || k), 1, 15))
                    AS BIGINT) % {w} AS bucket,
               COUNT(*) AS cnt
        FROM __pairs GROUP BY 1, 2
    ), __cand AS (
        SELECT DISTINCT CAST({key_expr} AS VARCHAR) AS k FROM {table_sql}
        WHERE {key_expr} IS NOT NULL
    ), __probe AS (
        SELECT k, i,
               CAST(('0x' || SUBSTRING(MD5(CAST(i AS VARCHAR) || '|' || k), 1, 15))
                    AS BIGINT) % {w} AS bucket
        FROM __cand CROSS JOIN GENERATE_SERIES(0, {d - 1}) AS __g(i)
    )
    SELECT p.k, CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS {est_col}
    FROM __probe p LEFT JOIN __cells c ON p.i = c.i AND p.bucket = c.bucket
    GROUP BY p.k
    """


# ---------------------------------------------------------------------------
# DDSketch: mergeable quantile sketch with RELATIVE-error guarantee
# (Masson, Rim, Lee, "DDSketch: a fast and fully-mergeable quantile
# sketch with relative-error guarantees", VLDB 2019). State = integer
# counts of logarithmic buckets (bucket k covers (gamma^(k-1), gamma^k],
# gamma = (1+alpha)/(1-alpha)), so any quantile estimate is within
# alpha RELATIVE error of the true order statistic; buckets merge by
# SUM (associative — partition partials, micro-batches, and day rollups
# all combine to the identical state), and a bounded-size collapse
# folds the LOWEST buckets together when the store exceeds its cap
# (preserving high-quantile accuracy, the paper's rule).
#
# Why DDSketch and not KLL here: KLL's compactors are RANDOMIZED and
# their state depends on the merge-tree shape — under a distributed
# groupBy the merge order is nondeterministic, so KLL state can never
# be hash-pinned against a SQL replay. Every sketch in this family
# (HLL registers, CMS cells, KMV bottom-k, Bloom bits) is a pure
# function of the input MULTISET; DDSketch is the quantile sketch in
# that class — deterministic, order-insensitive, mergeable, bounded —
# which is exactly what the repo's oracle contract requires. (The
# trade: alpha-RELATIVE value error instead of KLL's uniform rank
# error; for latency/price-shaped positive data, relative error is the
# guarantee practitioners actually quote.)
#
# Zero values occupy a reserved sentinel bucket (DDSketch's separate
# zero count) excluded from collapse; negatives are out of scope and
# must be filtered by the caller (documented, not silently dropped:
# dd_bucket raises at execution time if it sees one, riding the
# bucketing pass instead of a separate pre-scan).
# ---------------------------------------------------------------------------

DD_ZERO_BKT = -(1 << 62)  # sentinel bucket for exact zeros


def dd_gamma(alpha: float) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


def dd_bucket(col: Column, alpha: float) -> Column:
    """Logarithmic bucket index ``ceil(ln(v) / ln(gamma))`` for v > 0,
    the zero sentinel for v = 0. Pure JVM math — one log, one divide,
    one ceil per row, inside whole-stage codegen.

    Negatives RAISE at execution time via a ``raise_error`` branch in
    the same expression — the guard rides the one bucketing pass every
    consumer (batch build, streaming state, rollup cascade) already
    runs, instead of a separate data-sized pre-scan."""
    import math

    lg = math.log(dd_gamma(alpha))
    return (
        F.when(
            col < 0,
            F.raise_error(
                F.concat(
                    F.lit("ddsketch: negative value "),
                    col.cast("string"),
                    F.lit(
                        " — DDSketch's logarithmic buckets cover [0, inf); "
                        "filter or split the negative store explicitly"
                    ),
                )
            ).cast("long"),
        )
        .when(col == 0, F.lit(DD_ZERO_BKT))
        .otherwise(F.ceil(F.log(col.cast("double")) / F.lit(lg)))
        .cast("long")
    )


def ddsketch_state(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    alpha: float = 0.01,
    max_buckets: int = 128,
) -> DataFrame:
    """Per-group DDSketch state rows ``group_cols + (bkt, cnt)``.

    Scale shape: ONE shuffle on (group, bkt) with map-side partial SUM —
    the exchange carries at most ``buckets-per-group × partitions`` rows
    regardless of input size (the CMS/HLL bound, applied to quantiles).
    The collapse then runs per-group WINDOWS over the bucket frame,
    which is already sketch-sized, not data-sized.

    Collapse rule (paper): while the positive-bucket store exceeds
    ``max_buckets``, merge the lowest buckets — net effect: the lowest
    ``nb - max_buckets + 1`` buckets fold into the highest index among
    them. Deterministic on the multiset, so batch, micro-batch, and
    rollup builds land on bit-identical state. The zero sentinel is
    DDSketch's separate zero counter: never collapsed, never counted
    against the cap.
    """
    v = F.col(value_col)
    # negatives raise inside dd_bucket's expression at execution time —
    # the guard rides the single aggregation pass (no extra input scan;
    # the old where(v < 0).limit(1).count() pre-check doubled input I/O
    # in the common no-negatives case)
    raw = (
        df.where(v.isNotNull())
        .select(*group_cols, dd_bucket(v, alpha).alias("bkt"))
        .groupBy(*group_cols, "bkt")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return dd_collapse(raw, group_cols, max_buckets)


def dd_collapse(
    raw: DataFrame, group_cols: list[str], max_buckets: int
) -> DataFrame:
    """Fold the lowest positive buckets of a raw ``(group..., bkt, cnt)``
    store down to ``max_buckets`` per group (the paper's lowest-bucket
    merge; zero sentinel exempt). Shared by the batch build and the
    streaming finalize — ONE collapse definition, so a drained
    streaming store lands on the exact state a batch build produces."""
    gw = Window.partitionBy(*group_cols) if group_cols else Window.partitionBy(F.lit(1))
    pos = F.col("bkt") != DD_ZERO_BKT
    r = F.sum(F.when(pos, 1).otherwise(0)).over(
        gw.orderBy("bkt").rowsBetween(Window.unboundedPreceding, 0)
    )
    nb = F.sum(F.when(pos, 1).otherwise(0)).over(gw)
    cut = nb - F.lit(max_buckets) + 1
    ranked = raw.select(
        *group_cols, "bkt", "cnt", r.alias("__r"), cut.alias("__cut")
    )
    floor_bkt = F.max(
        F.when(pos & (F.col("__r") == F.col("__cut")), F.col("bkt"))
    ).over(gw)
    collapsed = ranked.select(
        *group_cols,
        F.when(pos & (F.col("__r") <= F.col("__cut")), floor_bkt)
        .otherwise(F.col("bkt"))
        .alias("bkt"),
        "cnt",
    )
    return collapsed.groupBy(*group_cols, "bkt").agg(
        F.sum("cnt").alias("cnt")
    )


def ddsketch_quantiles(
    state: DataFrame,
    group_cols: list[str],
    qs: list[float],
    alpha: float = 0.01,
    est_col: str = "est_value",
) -> DataFrame:
    """Quantile estimates from a ``ddsketch_state`` frame: per (group,
    q), the first bucket (ascending, zero sentinel first) whose
    cumulative count reaches ``max(1, ceil(q * n))``, estimated at the
    bucket's relative midpoint ``2*gamma^k / (gamma+1)`` (0 for the
    zero bucket) — within ``alpha`` relative error of the true order
    statistic when the collapse never reached that bucket. All frames
    here are sketch-sized; the only data-sized work happened in
    ``ddsketch_state``'s single exchange."""
    import math

    g = dd_gamma(alpha)
    lg = math.log(g)
    gw = Window.partitionBy(*group_cols) if group_cols else Window.partitionBy(F.lit(1))
    cum = state.select(
        *group_cols,
        "bkt",
        F.sum("cnt").over(
            gw.orderBy("bkt").rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum"),
        F.sum("cnt").over(gw).alias("n"),
    )
    qf = F.explode(
        F.array(*[F.lit(float(q)) for q in qs])
    ).alias("q")
    targets = cum.select(*group_cols, "bkt", "cum", "n").select(
        *group_cols, "bkt", "cum", "n", qf
    ).withColumn(
        "target", F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("n")))
    )
    pick = (
        targets.where(F.col("cum") >= F.col("target"))
        .groupBy(*group_cols, "q", "n")
        .agg(F.min("bkt").alias("bkt"))
    )
    est = F.when(F.col("bkt") == DD_ZERO_BKT, F.lit(0.0)).otherwise(
        F.exp(F.col("bkt").cast("double") * F.lit(lg)) * F.lit(2.0 / (g + 1.0))
    )
    return pick.select(
        *group_cols,
        "q",
        F.col("n").cast("long").alias("n_values"),
        F.round(est, 6).alias(est_col),
    )


def ddsketch_state_moments(
    state: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Integer moments of the positive-bucket store — ``n_buckets``,
    ``sum(bkt*cnt)``, ``sum(bkt^2*cnt)`` — the HLL ``_s``/``_v``
    precedent: a compact, exact-integer pin of the FULL sketch state for
    the oracle's hash check (the quantile walk alone only pins the
    buckets it lands on)."""
    pos = F.col("bkt") != DD_ZERO_BKT
    return state.groupBy(*group_cols).agg(
        F.sum(F.when(pos, 1).otherwise(0)).cast("long").alias("n_buckets"),
        F.sum(F.when(pos, F.col("bkt") * F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("state_s1"),
        F.sum(
            F.when(pos, F.col("bkt") * F.col("bkt") * F.col("cnt")).otherwise(0)
        )
        .cast("long")
        .alias("state_s2"),
    )


def ddsketch_oracle_sql(
    value_expr: str,
    group_cols: list[str],
    table_sql: str,
    qs: list[float],
    alpha: float = 0.01,
    max_buckets: int = 128,
) -> str:
    """DuckDB replay of DDSketch build + collapse + quantile walk. The
    log-bucket boundary arithmetic uses the same IEEE doubles on both
    engines (``ln_gamma`` is f-stringed at full precision); a value
    would have to sit within ~1 ulp of a transcendental bucket boundary
    for the engines' libm ``ln`` to disagree on a ceil — not observed,
    and pinned by the fixture."""
    import math

    g = dd_gamma(alpha)
    lg = repr(math.log(g))
    mid = repr(2.0 / (g + 1.0))
    gsel = ", ".join(group_cols)
    gpfx = f"{gsel}, " if group_cols else ""
    gpart = f"PARTITION BY {gsel}" if group_cols else ""
    qvals = ", ".join(repr(float(q)) for q in qs)
    if group_cols:
        pjoin = ", ".join(f"__pick.{c}" for c in group_cols) + ","
        onc = " AND ".join(f"__pick.{c} = __mom.{c}" for c in group_cols)
        momjoin = f"JOIN __mom ON {onc}"
    else:
        pjoin = ""
        momjoin = "CROSS JOIN __mom"
    return f"""
    WITH __raw AS (
        SELECT {gpfx}
               CASE WHEN {value_expr} = 0 THEN {DD_ZERO_BKT}
                    ELSE CAST(CEIL(LN(CAST({value_expr} AS DOUBLE)) / {lg})
                              AS BIGINT) END AS bkt,
               COUNT(*) AS cnt
        FROM {table_sql}
        WHERE {value_expr} IS NOT NULL
        GROUP BY ALL
    ), __ranked AS (
        SELECT *,
               SUM(CASE WHEN bkt != {DD_ZERO_BKT} THEN 1 ELSE 0 END)
                   OVER ({gpart} ORDER BY bkt
                         ROWS UNBOUNDED PRECEDING) AS __r,
               SUM(CASE WHEN bkt != {DD_ZERO_BKT} THEN 1 ELSE 0 END)
                   OVER ({gpart}) - {max_buckets} + 1 AS __cut
        FROM __raw
    ), __coll AS (
        SELECT {gpfx}
               CASE WHEN bkt != {DD_ZERO_BKT} AND __r <= __cut
                    THEN MAX(CASE WHEN bkt != {DD_ZERO_BKT} AND __r = __cut
                                  THEN bkt END) OVER ({gpart})
                    ELSE bkt END AS bkt,
               cnt
        FROM __ranked
    ), __state AS (
        SELECT {gpfx} bkt, SUM(cnt) AS cnt FROM __coll GROUP BY ALL
    ), __cum AS (
        SELECT {gpfx} bkt,
               SUM(cnt) OVER ({gpart} ORDER BY bkt
                              ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cnt) OVER ({gpart}) AS n
        FROM __state
    ), __t AS (
        SELECT __cum.*, q,
               GREATEST(1, CAST(CEIL(q * n) AS BIGINT)) AS target
        FROM __cum CROSS JOIN (SELECT UNNEST([{qvals}]::DOUBLE[]) AS q) __q
    ), __pick AS (
        SELECT {gpfx} q, n, MIN(bkt) AS bkt
        FROM __t WHERE cum >= target GROUP BY ALL
    ), __mom AS (
        -- integer state moments: pin the FULL bucket store (count of
        -- positive buckets + first/second weighted index sums), not
        -- just the one bucket each quantile walked to
        SELECT {gpfx}
               SUM(CASE WHEN bkt != {DD_ZERO_BKT} THEN 1 ELSE 0 END)
                   AS n_buckets,
               SUM(CASE WHEN bkt != {DD_ZERO_BKT} THEN bkt * cnt ELSE 0 END)
                   AS state_s1,
               SUM(CASE WHEN bkt != {DD_ZERO_BKT} THEN bkt * bkt * cnt
                        ELSE 0 END) AS state_s2
        FROM __state GROUP BY ALL
    )
    SELECT {pjoin} q, CAST(n AS BIGINT) AS n_values,
           ROUND(CASE WHEN bkt = {DD_ZERO_BKT} THEN 0.0
                      ELSE EXP(CAST(bkt AS DOUBLE) * {lg}) * {mid} END,
                 6) AS est_value,
           CAST(n_buckets AS BIGINT) AS n_buckets,
           CAST(state_s1 AS BIGINT) AS state_s1,
           CAST(state_s2 AS BIGINT) AS state_s2
    FROM __pick {momjoin}
    """
