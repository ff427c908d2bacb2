"""Sketch operators (operators/sketches.py): accuracy, the one-sided CMS
guarantee, mergeability (the property that makes sketches partition- and
day-rollup-friendly), duplicate-insensitivity, and the bounded-shuffle /
broadcast plan shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from pmp_analytics_spark.operators.sketches import (
    cms_estimate,
    cms_sketch,
    hll_cardinality,
    hll_registers,
)
from pmp_analytics_spark.plans import count_exchanges, has_broadcast_hash_join


def _keys(spark, n, copies=1):
    df = spark.range(n).select(F.concat(F.lit("key-"), F.col("id")).alias("k"))
    for _ in range(copies - 1):
        df = df.unionAll(df.limit(n))
    return df


def test_hll_accuracy_across_cardinalities(spark):
    # m=256 -> ~6.5% typical relative error; assert a 3-sigma-ish 20%.
    # Covers both estimator branches: 60 keys resolve via the
    # linear-counting small-range correction, 6000 via the raw
    # harmonic-mean path.
    for n in (60, 600, 6000):
        est = hll_cardinality(_keys(spark, n), "k", [], p=8).collect()[0]
        assert abs(est["est_distinct"] - n) / n < 0.20, (n, est["est_distinct"])


def test_hll_duplicate_insensitive(spark):
    # Cardinality estimation must see THE SET, not the multiset: 5 copies
    # of every key leave every register — and so the estimate — unchanged.
    once = hll_cardinality(_keys(spark, 500), "k", [], p=8).collect()[0]
    five = hll_cardinality(_keys(spark, 500, copies=5), "k", [], p=8).collect()[0]
    assert once["est_distinct"] == five["est_distinct"]
    assert once["est_distinct_s"] == five["est_distinct_s"]


def test_hll_registers_merge(spark):
    # Register arrays merge by cell-wise MAX: two disjoint halves' merged
    # registers must equal the whole corpus's registers — the associativity
    # that lets partials combine across executors / days / streams.
    whole = _keys(spark, 1000)
    h1 = whole.where(F.col("k") < "key-5")  # lexicographic split, disjoint
    h2 = whole.where(~(F.col("k") < "key-5"))
    merged = (
        hll_registers(h1, "k", [], p=8)
        .unionByName(hll_registers(h2, "k", [], p=8))
        .groupBy("j")
        .agg(F.max("reg").alias("reg"))
    )
    direct = hll_registers(whole, "k", [], p=8)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_hll_bounded_shuffles(spark):
    # Sketch's reason to exist: the plan shuffles register rows (<= m per
    # group per partition), never the key universe. Two exchanges total:
    # (group, j) register build + per-group finalize.
    df = hll_cardinality(_keys(spark, 1000), "k", [], p=8)
    assert count_exchanges(df) <= 2


def test_cms_one_sided_and_tight(spark):
    # key-i appears i times, i in 1..60 (1830 increments). CMS never
    # under-counts; with d=4 rows of w=512 counters the deterministic
    # md5-family layout keeps the worst overcount within the e/w bound's
    # ballpark (assert <= 2 * e/w * N ~ 19 here).
    n, total = 60, sum(range(1, 61))
    base = spark.range(1, n + 1).select(
        F.col("id"), F.explode(F.sequence(F.lit(1), F.col("id"))).alias("rep")
    )
    sketch = cms_sketch(base, "id", d=4, w=512)
    est = cms_estimate(sketch, base.select("id").distinct(), "id", d=4, w=512)
    rows = {
        r["id"]: r["est_count"]
        for r in est.collect()
    }
    bound = 2 * 2.718281828 / 512 * total
    for i in range(1, n + 1):
        assert rows[i] >= i, (i, rows[i])
        assert rows[i] - i <= bound, (i, rows[i], bound)


def test_cms_sketch_merge(spark):
    # Counter grids merge by cell-wise SUM: sketches of two disjoint
    # halves, summed, equal the whole input's sketch.
    base = spark.range(200).select((F.col("id") % 40).alias("k"))
    h1 = base.where(F.col("k") < 20)
    h2 = base.where(F.col("k") >= 20)
    merged = (
        cms_sketch(h1, "k", d=4, w=64)
        .unionByName(cms_sketch(h2, "k", d=4, w=64))
        .groupBy("i", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = cms_sketch(base, "k", d=4, w=64)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_cms_estimate_broadcasts_sketch(spark):
    # The point-query join must broadcast the <= d*w-cell sketch, keeping
    # the candidate side shuffle-free however large it is.
    base = spark.range(500).select((F.col("id") % 100).alias("k"))
    est = cms_estimate(cms_sketch(base, "k"), base.distinct(), "k")
    assert has_broadcast_hash_join(est)


def test_kmv_exact_below_k(spark):
    from pmp_analytics_spark.operators.sketches import kmv_cardinality, kmv_sketch

    sk = kmv_sketch(_keys(spark, 100), "k", [], k=256)
    row = kmv_cardinality(sk, [], k=256).collect()[0]
    assert row["est_distinct"] == 100.0 and row["n_seen"] == 100


def test_kmv_accuracy(spark):
    # k=256 -> ~1/sqrt(k-2) ~ 6% typical relative error; assert 20%.
    from pmp_analytics_spark.operators.sketches import kmv_cardinality, kmv_sketch

    for n in (2000, 20000):
        sk = kmv_sketch(_keys(spark, n), "k", [], k=256)
        row = kmv_cardinality(sk, [], k=256).collect()[0]
        assert row["n_seen"] == 256
        assert abs(row["est_distinct"] - n) / n < 0.20, (n, row["est_distinct"])


def test_kmv_merge(spark):
    # Bottom-k sketches merge by union + dedupe + re-rank: merging two
    # disjoint halves' sketches must reproduce the whole input's sketch.
    from pyspark.sql import Window

    from pmp_analytics_spark.operators.sketches import kmv_sketch

    whole = _keys(spark, 3000)
    h1 = whole.where(F.col("k") < "key-2")
    h2 = whole.where(~(F.col("k") < "key-2"))
    w = Window.partitionBy().orderBy(F.asc("hv"))
    merged = (
        kmv_sketch(h1, "k", [], k=128).select("hv")
        .unionByName(kmv_sketch(h2, "k", [], k=128).select("hv"))
        .distinct()
        .withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= 128)
    )
    direct = kmv_sketch(whole, "k", [], k=128)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_streaming_hll_registers_match_batch_across_batches(spark, tmp_path):
    """Register max is associative, so ANY micro-batch split must yield
    byte-identical registers to the batch build — pinned here with a
    3-file drop consumed one file per trigger."""
    import time

    from pmp_analytics_spark.operators.sketches import hll_registers
    from pmp_analytics_spark.sources.reader import load_table
    from pmp_analytics_spark.streaming import run_to_memory

    batch = load_table(spark, "/root/testdata/sf0.001", "events")
    expected = sorted(
        map(tuple, hll_registers(batch, "user_id", ["event_type"], p=8).collect())
    )

    src = tmp_path / "drops"
    src.mkdir()
    rows = batch.collect()
    third = (len(rows) + 2) // 3
    for i in range(3):
        chunk = rows[i * third : (i + 1) * third]
        spark.createDataFrame(chunk, batch.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"drop_{i}"))
        time.sleep(1.1)

    sdf = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = run_to_memory(
        hll_registers(sdf, "user_id", ["event_type"], p=8),
        "t_hll_regs_mb",
        state_partitions=8,
    )
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= 2
    got = sorted(map(tuple, spark.table("t_hll_regs_mb").collect()))
    assert got == expected and len(got) > 0


def test_bloom_no_false_negatives_and_merge(spark):
    from pmp_analytics_spark.operators.sketches import bloom_build, bloom_probe

    members = spark.range(300).select(F.concat(F.lit("m-"), F.col("id")).alias("k"))
    others = spark.range(300).select(F.concat(F.lit("x-"), F.col("id")).alias("k"))
    f = bloom_build(members, "k", mbits=1 << 14, d=6)
    got = {
        r["k"]: r["bloom_hit"]
        for r in bloom_probe(
            f, members.unionByName(others), "k", mbits=1 << 14, d=6
        ).collect()
    }
    # one-sided guarantee: every member hits
    assert all(got[f"m-{i}"] == 1 for i in range(300))
    # fp rate sanity at this load (300*6/16384 bits): non-members mostly miss
    assert sum(got[f"x-{i}"] for i in range(300)) <= 15

    # merge = union + distinct of position frames
    h1 = members.where(F.col("k") < "m-2")
    h2 = members.where(~(F.col("k") < "m-2"))
    merged = (
        bloom_build(h1, "k", mbits=1 << 14, d=6)
        .unionByName(bloom_build(h2, "k", mbits=1 << 14, d=6))
        .distinct()
    )
    assert sorted(r["pos"] for r in merged.collect()) == sorted(
        r["pos"] for r in f.collect()
    )


def test_bloom_probe_broadcasts_filter(spark):
    from pmp_analytics_spark.operators.sketches import bloom_build, bloom_probe

    base = spark.range(500).select(F.col("id").cast("string").alias("k"))
    probe = bloom_probe(bloom_build(base, "k"), base, "k")
    assert has_broadcast_hash_join(probe)


def test_histogram_quantiles_within_one_bucket(spark):
    from pmp_analytics_spark.operators.sketches import (
        histogram_bins,
        histogram_quantiles,
    )

    # skewed-ish distribution: id^1.5 over 5000 rows
    df = spark.range(1, 5001).select((F.pow(F.col("id"), 1.5)).alias("v"))
    bins, bounds = histogram_bins(df, "v", bins=128)
    est = {r["q"]: r["est_value"] for r in histogram_quantiles(bins, bounds, [0.5, 0.9, 0.99], bins=128).collect()}
    exact = df.agg(
        *[F.percentile("v", F.lit(q)).alias(f"e{q}") for q in (0.5, 0.9, 0.99)]
    ).collect()[0]
    b = bounds.collect()[0]
    width = (b["mx"] - b["mn"]) / 128
    for q in (0.5, 0.9, 0.99):
        assert abs(est[q] - exact[f"e{q}"]) <= width, (q, est[q], exact[f"e{q}"], width)


def test_histogram_bins_merge(spark):
    from pmp_analytics_spark.operators.sketches import histogram_bins

    df = spark.range(2000).select(F.col("id").cast("double").alias("v"))
    whole, bounds = histogram_bins(df, "v", bins=64)
    # halves binned against the WHOLE input's bounds (the merge contract:
    # partials share the bound frame), summed cell-wise == whole
    h1 = df.where(F.col("v") < 1000)
    h2 = df.where(F.col("v") >= 1000)
    import pyspark.sql.functions as FF

    def bins_with(frame):
        return (
            frame.crossJoin(FF.broadcast(bounds))
            .select(
                FF.least(
                    FF.floor((FF.col("v") - FF.col("mn")) / (FF.col("mx") - FF.col("mn")) * 64),
                    FF.lit(63),
                ).cast("long").alias("bin")
            )
            .groupBy("bin")
            .agg(FF.count(FF.lit(1)).alias("cnt"))
        )

    merged = (
        bins_with(h1).unionByName(bins_with(h2)).groupBy("bin").agg(FF.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_hll_cascade_equals_direct(spark):
    # max-merge associativity on real data: hourly registers rolled up to
    # days == registers built per day directly.
    from pmp_analytics_spark.operators.sketches import hll_registers
    from pmp_analytics_spark.sources.reader import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        F.unix_timestamp(F.date_trunc("day", "ts")).alias("day_s"),
        F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_s"),
        "user_id",
    )
    hourly = hll_registers(ev, "user_id", ["day_s", "hour_s"], p=8)
    cascaded = hourly.groupBy("day_s", "j").agg(F.max("reg").alias("reg"))
    direct = hll_registers(ev, "user_id", ["day_s"], p=8)
    assert sorted(map(tuple, cascaded.collect())) == sorted(map(tuple, direct.collect()))


def test_cms_estimate_absent_key_is_zero(spark):
    # a key the sketch never saw must estimate 0 (empty cells coalesce),
    # not vanish from the output or over-report from partial cell hits
    base = spark.range(100).select(F.concat(F.lit("in-"), F.col("id")).alias("k"))
    absent = spark.range(5).select(F.concat(F.lit("out-"), F.col("id")).alias("k"))
    est = cms_estimate(cms_sketch(base, "k"), base.unionByName(absent), "k")
    rows = {r["k"]: r["est_count"] for r in est.collect()}
    assert len(rows) == 105  # every candidate gets a verdict
    assert all(rows[f"in-{i}"] >= 1 for i in range(100))
    # d=4/w=512 at 100 keys: odds of ALL FOUR cells colliding are nil
    assert all(rows[f"out-{i}"] == 0 for i in range(5))


def test_bloom_probe_duplicate_candidates_no_false_negative(spark):
    # the ingest-batch case: the same key appears twice among candidates
    # (two docs, identical text) — the probe must still report a hit
    from pmp_analytics_spark.operators.sketches import bloom_build, bloom_probe

    members = spark.range(50).select(F.concat(F.lit("m-"), F.col("id")).alias("k"))
    dup_cands = members.unionByName(members)  # every key twice
    f = bloom_build(members, "k")
    got = {r["k"]: r["bloom_hit"] for r in bloom_probe(f, dup_cands, "k").collect()}
    assert all(got[f"m-{i}"] == 1 for i in range(50))


def test_sketches_empty_and_degenerate_inputs(spark):
    from pmp_analytics_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
        histogram_bins,
        histogram_quantiles,
        kmv_cardinality,
        kmv_sketch,
    )

    empty = spark.range(0).select(F.col("id").cast("string").alias("k"))
    # empty input: global (no-group) estimators emit ONE row — the
    # correct estimate 0 (all registers empty -> linear counting; an
    # unfilled KMV sketch IS the exact empty set)
    hll_row = hll_cardinality(empty, "k", [], p=8).collect()
    assert len(hll_row) == 1 and hll_row[0]["est_distinct"] == 0.0
    kmv_row = kmv_cardinality(kmv_sketch(empty, "k", [], k=8), [], k=8).collect()
    assert len(kmv_row) == 1 and kmv_row[0]["est_distinct"] == 0.0
    assert cms_sketch(empty, "k").count() == 0
    assert bloom_build(empty, "k").count() == 0
    bins, bounds = histogram_bins(empty.select(F.col("k").cast("double").alias("v")), "v")
    assert bins.count() == 0
    assert histogram_quantiles(bins, bounds, [0.5]).count() == 0

    # degenerate histogram: every value identical -> single bin 0, and
    # every quantile estimate collapses to that value exactly
    const = spark.range(100).select(F.lit(42.0).alias("v"))
    bins, bounds = histogram_bins(const, "v", bins=64)
    assert [tuple(r) for r in bins.collect()] == [(0, 100)]
    ests = histogram_quantiles(bins, bounds, [0.5, 0.99], bins=64).collect()
    assert all(r["est_value"] == 42.0 for r in ests)

    # probing an empty bloom filter: every candidate misses, none error
    some = spark.range(3).select(F.col("id").cast("string").alias("k"))
    got = bloom_probe(bloom_build(empty, "k"), some, "k").collect()
    assert len(got) == 3 and all(r["bloom_hit"] == 0 for r in got)


def test_streaming_hll_state_survives_restart(spark, tmp_path):
    """Recovery contract for register state: drain half the corpus, STOP,
    add the rest, restart on the SAME checkpoint — the recovered state
    must max-merge the new half on top of the old, landing exactly on
    the whole-corpus batch registers (no loss, no double-count ... though
    max is idempotent, a LOST state partition would undercount)."""
    from pmp_analytics_spark.operators.sketches import hll_registers
    from pmp_analytics_spark.sources.reader import load_table

    batch = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_type", "user_id"
    )
    expected = sorted(
        map(tuple, hll_registers(batch, "user_id", ["event_type"], p=8).collect())
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    rows = batch.collect()
    half = len(rows) // 2
    spark.createDataFrame(rows[:half], batch.schema).write.mode("append").parquet(src)

    def drain(qname):
        sdf = spark.readStream.schema(batch.schema).parquet(src)
        q = (
            hll_registers(sdf, "user_id", ["event_type"], p=8)
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(map(tuple, spark.table(qname).collect()))

    first = drain("t_hll_restart_1")
    assert first  # phase 1 saw data
    spark.createDataFrame(rows[half:], batch.schema).write.mode("append").parquet(src)
    second = drain("t_hll_restart_2")
    assert second == expected
    # monotonicity: restarting only ever raises registers (max-merge)
    exp_map = {(t, j): r for t, j, r in expected}
    assert all(r <= exp_map[(t, j)] for t, j, r in first)


def test_streaming_cms_cells_match_batch_across_batches(spark, tmp_path):
    """Cell sums are associative: any micro-batch split must reproduce
    the batch sketch exactly — pinned with a 3-file drop consumed one
    file per trigger (the CMS twin of the HLL register test)."""
    import time

    from pmp_analytics_spark.sources.reader import load_table
    from pmp_analytics_spark.streaming import run_to_memory

    batch = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id"
    ).where(F.col("user_id").isNotNull())
    expected = sorted(map(tuple, cms_sketch(batch, "user_id", d=4, w=128).collect()))

    src = tmp_path / "drops"
    src.mkdir()
    rows = batch.collect()
    third = (len(rows) + 2) // 3
    for i in range(3):
        spark.createDataFrame(rows[i * third : (i + 1) * third], batch.schema).coalesce(
            1
        ).write.mode("overwrite").parquet(str(src / f"drop_{i}"))
        time.sleep(1.1)

    sdf = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = run_to_memory(cms_sketch(sdf, "user_id", d=4, w=128), "t_cms_mb", state_partitions=8)
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= 2
    got = sorted(map(tuple, spark.table("t_cms_mb").collect()))
    assert got == expected and len(got) > 0


def test_kmv_overlap_estimates_near_exact(spark):
    # Exact-vs-estimate validation for event_audience_overlap_kmv.
    # Deliberately a TEST, not part of the declared query: the exact arm
    # self-joins the full distinct user-day universe — precisely the
    # shuffle the KMV sketch exists to avoid at 100 TB — so the
    # production query publishes sketch columns only and the exact
    # comparison lives here, at a scale where the self-join is cheap.
    from pmp_analytics_spark.queries.sketches import event_audience_overlap_kmv
    from pmp_analytics_spark.sources.reader import load_table

    sf_dir = "/root/testdata/sf0.001"
    est = {
        (r["et_a"], r["et_b"]): r
        for r in event_audience_overlap_kmv(spark, sf_dir).collect()
    }
    assert est, "overlap query returned no pairs"

    base = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select(
            "event_type",
            F.concat_ws("|", F.col("user_id"), F.to_date("ts")).alias("uday"),
        )
        .distinct()
        .cache()
    )
    try:
        n_by_type = {
            r["event_type"]: r["n"]
            for r in base.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        a = base.select(F.col("event_type").alias("et_a"), "uday")
        b = base.select(F.col("event_type").alias("et_b"), "uday")
        exact_inter = {
            (r["et_a"], r["et_b"]): r["x"]
            for r in a.join(b, "uday")
            .where(F.col("et_a") < F.col("et_b"))
            .groupBy("et_a", "et_b")
            .agg(F.count(F.lit(1)).alias("x"))
            .collect()
        }
    finally:
        base.unpersist()

    types = sorted(n_by_type)
    expected_pairs = {
        (x, y) for i, x in enumerate(types) for y in types[i + 1 :]
    }
    assert set(est) == expected_pairs

    for (ta, tb), row in est.items():
        xi = exact_inter.get((ta, tb), 0)
        xu = n_by_type[ta] + n_by_type[tb] - xi
        # k=256 bottom-k: union rel-err ~1/sqrt(k)=6.25%; 3-sigma ~20%.
        assert abs(row["est_union"] - xu) <= max(0.20 * xu, 3), (ta, tb, row, xu)
        # intersection = ratio estimator on the merged sketch — noisier;
        # allow 35% relative plus small absolute slack for tiny overlaps
        assert abs(row["est_inter"] - xi) <= max(0.35 * xi, 10), (ta, tb, row, xi)


def test_streaming_cms_state_survives_restart(spark, tmp_path):
    """The CMS counter grid's recovery contract (the CMS twin of
    test_streaming_hll_state_survives_restart): drain half the corpus,
    STOP, add the rest, restart on the SAME checkpoint — recovered cell
    sums must accumulate the second half on top of the first, landing
    exactly on the whole-corpus batch grid. Cell sums are NOT idempotent
    (unlike HLL's max-merge), so a replayed or lost batch would show up
    as an exact count mismatch — the strictest form of the check."""
    from pmp_analytics_spark.sources.reader import load_table

    batch = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select("user_id")
        .where(F.col("user_id").isNotNull())
    )
    expected = sorted(map(tuple, cms_sketch(batch, "user_id", d=4, w=128).collect()))

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    rows = batch.collect()
    half = len(rows) // 2
    spark.createDataFrame(rows[:half], batch.schema).write.mode("append").parquet(src)

    def drain(qname):
        sdf = spark.readStream.schema(batch.schema).parquet(src)
        q = (
            cms_sketch(sdf, "user_id", d=4, w=128)
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(map(tuple, spark.table(qname).collect()))

    first = drain("t_cms_restart_1")
    assert first
    spark.createDataFrame(rows[half:], batch.schema).write.mode("append").parquet(src)
    second = drain("t_cms_restart_2")
    assert second == expected
    # monotonicity: cell counts only ever grow across the restart
    first_map = {(i, b): c for i, b, c in first}
    exp_map = {(i, b): c for i, b, c in expected}
    assert all(c <= exp_map[(i, b)] for (i, b), c in first_map.items())


def test_streaming_kmv_state_survives_restart(spark, tmp_path):
    """Bottom-k state recovery (the KMV leg of the restart battery):
    drain half, STOP, add the rest, restart on the same checkpoint. The
    recovered bottom-k must merge the new hashes on top of the old,
    landing on the batch kmv_sketch's hash set per group. Consumers keep
    the max-version update per group (groups untouched after the restart
    re-emit nothing — their phase-1 state IS final)."""
    from pmp_analytics_spark.operators.sketches import kmv_hash_frame, kmv_sketch
    from pmp_analytics_spark.sources.reader import load_table
    from pmp_analytics_spark.streaming.stateful import kmv_bottomk_stream

    K = 32
    batch = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_type", "user_id"
    )
    exp = {}
    for r in kmv_sketch(batch, "user_id", ["event_type"], k=K).collect():
        exp.setdefault(r["event_type"], []).append(r["hv"])
    expected = {t: sorted(h) for t, h in exp.items()}

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    rows = batch.collect()
    half = len(rows) // 2
    spark.createDataFrame(rows[:half], batch.schema).write.mode("append").parquet(src)

    out = str(tmp_path / "updates")

    def drain():
        # foreachBatch parquet-append sink: the memory sink refuses
        # checkpoint recovery in update mode, and recovery is the point
        sdf = spark.readStream.schema(batch.schema).parquet(src)
        q = (
            kmv_bottomk_stream(kmv_hash_frame(sdf, "user_id", ["event_type"]), ["event_type"], k=K)
            .writeStream.foreachBatch(
                lambda bdf, bid: bdf.write.mode("append").parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).collect()

    first = drain()
    assert first
    spark.createDataFrame(rows[half:], batch.schema).write.mode("append").parquet(src)
    updates = drain()
    latest: dict = {}
    for r in updates:
        if r["event_type"] not in latest or r["version"] > latest[r["event_type"]]["version"]:
            latest[r["event_type"]] = r
    got = {t: sorted(r["hvs"]) for t, r in latest.items()}
    assert got == expected
    # phase-1 state is always a superset-prefix: its bottom-k comes from
    # half the data, so every phase-1 hash >= the group's final floor
    for r in first:
        t = r["event_type"]
        assert sorted(r["hvs"])[0] >= expected[t][0]


def test_ddsketch_relative_error_and_rank(spark):
    """DDSketch guarantee (Masson et al. VLDB 2019): with no collapse,
    every quantile estimate is within alpha RELATIVE error of the true
    order statistic at rank ceil(q*n); the zero sentinel reports exact
    0.0. Lognormal data with duplicates and zeros."""
    import math
    import random

    from pmp_analytics_spark.operators.sketches import (
        ddsketch_quantiles,
        ddsketch_state,
    )

    rng = random.Random(3)
    vals = [round(math.exp(rng.gauss(2, 1.5)), 4) for _ in range(5000)]
    vals += vals[:500] + [0.0] * 23
    df = spark.createDataFrame(
        [(v, f"g{i % 2}") for i, v in enumerate(vals)], "v double, g string"
    )
    alpha = 0.01
    st = ddsketch_state(df, "v", ["g"], alpha=alpha, max_buckets=1 << 20)
    got = {
        (r["g"], r["q"]): (r["est_value"], r["n_values"])
        for r in ddsketch_quantiles(
            st, ["g"], [0.001, 0.5, 0.9, 0.99], alpha=alpha
        ).collect()
    }
    for g in ("g0", "g1"):
        gv = sorted(v for i, v in enumerate(vals) if f"g{i % 2}" == g)
        n = len(gv)
        for q in (0.001, 0.5, 0.9, 0.99):
            est, nn = got[(g, q)]
            assert nn == n
            true = gv[max(1, math.ceil(q * n)) - 1]
            if true == 0:
                assert est == 0.0
            else:
                assert abs(est - true) <= alpha * true * (1 + 1e-9), (g, q, est, true)


def test_ddsketch_collapse_bound_and_merge(spark):
    """The collapse caps the positive store at max_buckets (zero sentinel
    exempt), keeps accuracy ABOVE the folded region, and the state is a
    pure multiset function: sketch(A) ⊎ sketch(B) re-aggregated equals
    sketch(A ∪ B) row-for-row."""
    import math
    import random

    from pyspark.sql import functions as F

    from pmp_analytics_spark.operators.sketches import (
        DD_ZERO_BKT,
        ddsketch_quantiles,
        ddsketch_state,
    )

    rng = random.Random(11)
    vals = [round(math.exp(rng.gauss(1, 1.2)), 4) for _ in range(8000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    st = ddsketch_state(df, "v", [], alpha=0.01, max_buckets=64)
    rows = {r["bkt"]: r["cnt"] for r in st.collect()}
    assert len([b for b in rows if b != DD_ZERO_BKT]) <= 64
    # p99 target sits above the folded mass here -> guarantee holds
    est = {
        r["q"]: r["est_value"]
        for r in ddsketch_quantiles(st, [], [0.99], alpha=0.01).collect()
    }
    true = sorted(vals)[max(1, math.ceil(0.99 * len(vals))) - 1]
    assert abs(est[0.99] - true) <= 0.01 * true * (1 + 1e-9)

    full = ddsketch_state(df, "v", [], alpha=0.01, max_buckets=1 << 20)
    a = df.where("v < 3")
    b = df.where("v >= 3")
    merged = (
        ddsketch_state(a, "v", [], alpha=0.01, max_buckets=1 << 20)
        .unionAll(ddsketch_state(b, "v", [], alpha=0.01, max_buckets=1 << 20))
        .groupBy("bkt")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in full.collect()
    }


def test_ddsketch_rejects_negatives(spark):
    """Negatives raise at EXECUTION time from inside dd_bucket's
    expression (the guard rides the single bucketing pass — no separate
    data-sized pre-scan), for both the batch builder and any direct
    dd_bucket consumer such as the streaming state queries."""
    import pytest as _pytest

    from pmp_analytics_spark.operators.sketches import ddsketch_state

    df = spark.createDataFrame([(1.0,), (-2.0,)], "v double")
    with _pytest.raises(Exception, match="negative value"):
        ddsketch_state(df, "v", [], alpha=0.01).collect()

    # the no-negatives plan must contain NO extra scan: building the
    # state frame is lazy and triggers zero jobs
    ok = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    state = ddsketch_state(ok, "v", [], alpha=0.01)
    assert [r["cnt"] for r in state.orderBy("bkt").collect()] == [1, 1]


def test_ddsketch_stream_multibatch_equals_batch(spark, tmp_path):
    """The DDSketch streaming state claim, pinned under FORCED
    micro-batch slicing (the HLL multi-batch precedent): three file
    drops under maxFilesPerTrigger=1, windowed (window, bucket) counts
    as the one stateful agg — the drained store must equal the batch
    bucket build row-for-row, because bucket-count SUM is associative
    regardless of how the stream was sliced."""
    import time

    from pmp_analytics_spark.operators.sketches import dd_bucket
    from pmp_analytics_spark.sources.reader import load_table
    from pmp_analytics_spark.streaming import run_to_memory

    batch = load_table(spark, "/root/testdata/sf0.001", "events").where(
        F.col("value").isNotNull()
    )

    def agg(df):
        return (
            df.withWatermark("ts", "2 hours")
            .groupBy(
                F.window("ts", "6 hours").alias("w"),
                dd_bucket(F.col("value"), 0.01).alias("bkt"),
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(
                F.unix_micros(F.col("w.start")).alias("ws"), "bkt", "cnt"
            )
        )

    expected = sorted(
        map(
            tuple,
            batch.groupBy(
                F.window("ts", "6 hours").alias("w"),
                dd_bucket(F.col("value"), 0.01).alias("bkt"),
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.unix_micros(F.col("w.start")).alias("ws"), "bkt", "cnt")
            .collect(),
        )
    )

    src = tmp_path / "drops"
    src.mkdir()
    rows = batch.collect()
    third = (len(rows) + 2) // 3
    for i in range(3):
        chunk = rows[i * third : (i + 1) * third]
        spark.createDataFrame(chunk, batch.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"drop_{i}"))
        time.sleep(1.1)

    sdf = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = run_to_memory(
        agg(sdf), "t_dd_mb", output_mode="complete", state_partitions=8
    )
    assert len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= 2
    got = sorted(map(tuple, spark.table("t_dd_mb").collect()))
    assert got == expected and len(got) > 0
