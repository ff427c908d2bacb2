"""join_mv_refresh — incremental maintenance of a denormalized
fact LEFT JOIN dim view from snapshot_delta CDC feeds of both bases.

The invariant under test everywhere: refresh(view(old), Δfact, Δdim)
== view(new), recomputed — across every delta class, chained rounds,
and with the view side never shuffled (plan-gated)."""

from __future__ import annotations

import pytest

from pmp_analytics_spark.operators.diff import join_mv_refresh, snapshot_delta
from pmp_analytics_spark.plans.audit import count_exchanges


def _fact(spark, rows):
    return spark.createDataFrame(rows, "fk long, dk long, amt double")


def _dim(spark, rows):
    return spark.createDataFrame(rows, "dk_ long, seg string, score double")


def _view(fact, dim):
    return fact.join(dim, fact["dk"] == dim["dk_"], "left").select(
        "fk", "dk", "amt", "seg", "score"
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _refresh(mv, old_f, new_f, old_d, new_d, **kw):
    return join_mv_refresh(
        mv,
        snapshot_delta(old_f, new_f, ["fk"]),
        snapshot_delta(old_d, new_d, ["dk_"]),
        new_d,
        "fk",
        "dk",
        "dk_",
        ["seg", "score"],
        **kw,
    )


@pytest.fixture(scope="module")
def scenario(spark):
    """Every delta class at once: fact add (fk=6), remove (fk=2),
    measure change (fk=3), FK move (fk=4 -> dim 30), FK move to a
    DANGLING key (fk=5 -> 99, no such dim row), fact row with NULL FK
    carried (fk=7); dim add (40), attribute change (20), remove (30 —
    which fk=4 just moved TO), NULL attribute installed (20's score)."""
    old_f = _fact(
        spark,
        [
            (1, 10, 100.0),
            (2, 10, 200.0),
            (3, 20, 300.0),
            (4, 20, 400.0),
            (5, 30, 500.0),
            (7, None, 700.0),
        ],
    )
    new_f = _fact(
        spark,
        [
            (1, 10, 100.0),
            (3, 20, 333.0),
            (4, 30, 400.0),
            (5, 99, 500.0),
            (6, 40, 600.0),
            (7, None, 700.0),
        ],
    )
    old_d = _dim(spark, [(10, "a", 1.0), (20, "b", 2.0), (30, "c", 3.0)])
    new_d = _dim(spark, [(10, "a", 1.0), (20, "B", None), (40, "d", 4.0)])
    return old_f, new_f, old_d, new_d


def test_refresh_equals_recompute_all_delta_classes(spark, scenario):
    old_f, new_f, old_d, new_d = scenario
    out = _refresh(_view(old_f, old_d), old_f, new_f, old_d, new_d)
    assert _rows(out) == _rows(_view(new_f, new_d))


def test_chained_rounds_equal_final_recompute(spark, scenario):
    """Two successive CDC rounds applied to the view == one recompute of
    the final snapshots (the refresh output must be a valid input)."""
    old_f, new_f, old_d, new_d = scenario
    fin_f = _fact(spark, [(3, 40, 999.0), (6, 40, 600.0), (7, 20, 700.0)])
    fin_d = _dim(spark, [(20, "B2", 5.0), (40, "d", 4.0)])
    v1 = _refresh(_view(old_f, old_d), old_f, new_f, old_d, new_d)
    v2 = _refresh(v1, new_f, fin_f, new_d, fin_d)
    assert _rows(v2) == _rows(_view(fin_f, fin_d))


def test_one_sided_deltas(spark, scenario):
    """None on the unchanged side: a fact-only round, then a dim-only
    round, each == recompute."""
    old_f, new_f, old_d, new_d = scenario
    fact_only = join_mv_refresh(
        _view(old_f, old_d),
        snapshot_delta(old_f, new_f, ["fk"]),
        None,
        old_d,
        "fk",
        "dk",
        "dk_",
        ["seg", "score"],
    )
    assert _rows(fact_only) == _rows(_view(new_f, old_d))
    dim_only = join_mv_refresh(
        _view(old_f, old_d),
        None,
        snapshot_delta(old_d, new_d, ["dk_"]),
        new_d,
        "fk",
        "dk",
        "dk_",
        ["seg", "score"],
    )
    assert _rows(dim_only) == _rows(_view(old_f, new_d))


def test_dim_add_fills_previously_dangling_fk(spark):
    """The LEFT-view self-maintainability case an INNER view cannot
    satisfy without a base rescan: a fact row whose FK dangled (NULL
    dim cols) gets its attributes installed when the dim row arrives."""
    old_f = new_f = _fact(spark, [(1, 10, 100.0)])
    old_d = _dim(spark, [])
    new_d = _dim(spark, [(10, "a", 1.0)])
    out = join_mv_refresh(
        _view(old_f, old_d),
        None,
        snapshot_delta(old_d, new_d, ["dk_"]),
        new_d,
        "fk",
        "dk",
        "dk_",
        ["seg", "score"],
    )
    assert _rows(out) == [(1, 10, 100.0, "a", 1.0)]


def test_dim_remove_nulls_out_referencing_rows(spark):
    old_f = new_f = _fact(spark, [(1, 10, 100.0), (2, 20, 200.0)])
    old_d = _dim(spark, [(10, "a", 1.0), (20, "b", 2.0)])
    new_d = _dim(spark, [(20, "b", 2.0)])
    out = join_mv_refresh(
        _view(old_f, old_d),
        None,
        snapshot_delta(old_d, new_d, ["dk_"]),
        new_d,
        "fk",
        "dk",
        "dk_",
        ["seg", "score"],
    )
    assert _rows(out) == [(1, 10, 100.0, None, None), (2, 20, 200.0, "b", 2.0)]


def test_view_side_never_shuffles(spark, scenario):
    """With broadcast deltas the ONLY shuffle in the refresh plan is the
    delta-sized FK distinct feeding the dim semi-join — eviction, dim
    patch, and enrichment are all broadcast-side, so the view (the
    100 TB operand) is map-only. Deltas arrive pre-materialized so the
    plan shows refresh machinery, not delta computation."""
    old_f, new_f, old_d, new_d = scenario
    fd = spark.createDataFrame(
        snapshot_delta(old_f, new_f, ["fk"]).collect(),
        snapshot_delta(old_f, new_f, ["fk"]).schema,
    )
    dd = spark.createDataFrame(
        snapshot_delta(old_d, new_d, ["dk_"]).collect(),
        snapshot_delta(old_d, new_d, ["dk_"]).schema,
    )
    out = join_mv_refresh(
        _view(old_f, old_d).localCheckpoint(eager=True),
        fd,
        dd,
        new_d,
        "fk",
        "dk",
        "dk_",
        ["seg", "score"],
    )
    assert count_exchanges(out) <= 1
    assert _rows(out) == _rows(_view(new_f, new_d))


def test_star_refresh_two_dims_equals_recompute(spark):
    """The N-dim star form: fact inserts must pick up BOTH dims'
    attributes in one refresh (the case per-dim composition of the
    two-table operator cannot express), while each dim's patch lands
    independently — including a dim change and a dim removal in the
    same round as a fact insert referencing both."""
    from pmp_analytics_spark.operators.diff import DimSpec, star_mv_refresh

    fact = "fk long, d1 long, d2 long, amt double"
    dim1 = "k1 long, seg string"
    dim2 = "k2 long, grade double"
    old_f = spark.createDataFrame([(1, 10, 100, 1.0), (2, 20, 200, 2.0)], fact)
    new_f = spark.createDataFrame(
        [(1, 10, 100, 1.0), (3, 20, 100, 3.0), (4, 99, 200, 4.0)], fact
    )
    old_d1 = spark.createDataFrame([(10, "a"), (20, "b")], dim1)
    new_d1 = spark.createDataFrame([(10, "a2"), (20, "b")], dim1)
    old_d2 = spark.createDataFrame([(100, 1.5), (200, 2.5)], dim2)
    new_d2 = spark.createDataFrame([(100, 1.5)], dim2)  # 200 removed

    def view(f, d1, d2):
        return (
            f.join(d1, f["d1"] == d1["k1"], "left")
            .join(d2, f["d2"] == d2["k2"], "left")
            .select("fk", "d1", "d2", "amt", "seg", "grade")
        )

    out = star_mv_refresh(
        view(old_f, old_d1, old_d2),
        snapshot_delta(old_f, new_f, ["fk"]),
        [
            DimSpec(snapshot_delta(old_d1, new_d1, ["k1"]), new_d1, "d1", "k1", ["seg"]),
            DimSpec(snapshot_delta(old_d2, new_d2, ["k2"]), new_d2, "d2", "k2", ["grade"]),
        ],
        "fk",
    )
    assert _rows(out) == _rows(view(new_f, new_d1, new_d2))
    by_fk = {r[0]: r for r in out.collect()}
    assert by_fk[3][4] == "b" and by_fk[3][5] == 1.5  # insert got BOTH dims
    assert by_fk[4][4] is None and by_fk[4][5] is None  # dangling + removed


def _multiplex_feed(spark, path, old_f, new_f, old_d, new_d, nfiles):
    from pyspark.sql import functions as F

    fd = snapshot_delta(old_f, new_f, ["fk"]).withColumn("entity", F.lit("fact"))
    dd = snapshot_delta(old_d, new_d, ["dk_"]).withColumn("entity", F.lit("dim"))
    fd.unionByName(dd, allowMissingColumns=True).repartition(nfiles).write.parquet(
        path
    )


def _drain_join_mv(spark, work, feed, view_root, dim_root):
    from pmp_analytics_spark.streaming.mv import cdc_join_mv_stream

    schema = spark.read.parquet(feed).schema
    cdc_join_mv_stream(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(feed),
        view_root,
        dim_root,
        "fk",
        "dk",
        "dk_",
        ["seg", "score"],
        checkpoint_dir=f"{work}/ckpt",
    )


def test_cdc_join_mv_stream_multibatch_equals_recompute(
    spark, tmp_path, scenario
):
    """The multiplexed two-root maintenance loop: both deltas sliced
    into three arbitrary micro-batches must land on the same final view
    AND dimension as the one-shot recompute (batch-boundary
    independence: per-key-once deltas, monotone dim state, dim patches
    reach every surviving row)."""
    from pmp_analytics_spark.sources.writers import publish_versioned, read_latest

    old_f, new_f, old_d, new_d = scenario
    view_root, dim_root = f"{tmp_path}/view", f"{tmp_path}/dim"
    feed = f"{tmp_path}/cdc"
    _multiplex_feed(spark, feed, old_f, new_f, old_d, new_d, nfiles=3)
    publish_versioned(_view(old_f, old_d).coalesce(1), view_root)
    publish_versioned(old_d.coalesce(1), dim_root)
    _drain_join_mv(spark, tmp_path, feed, view_root, dim_root)
    assert _rows(read_latest(spark, view_root)) == _rows(_view(new_f, new_d))
    assert _rows(read_latest(spark, dim_root)) == _rows(new_d)


def test_cdc_join_mv_stream_crash_between_publishes(spark, tmp_path, scenario):
    """Crash-consistency of the two-root pair: the dim publish of batch 0
    committed but the view publish didn't (simulated by pre-publishing
    the post-batch dim under marker batch:0). The replay must SKIP the
    dim apply (no double upsert) and complete the view apply against
    exactly the dim state the first attempt saw."""
    from pmp_analytics_spark.operators.diff import apply_snapshot_delta
    from pmp_analytics_spark.sources.writers import (
        latest_marker,
        publish_versioned,
        read_latest,
    )

    old_f, new_f, old_d, new_d = scenario
    view_root, dim_root = f"{tmp_path}/view", f"{tmp_path}/dim"
    feed = f"{tmp_path}/cdc"
    _multiplex_feed(spark, feed, old_f, new_f, old_d, new_d, nfiles=1)
    publish_versioned(_view(old_f, old_d).coalesce(1), view_root)
    # first attempt got through step 1 (dim publish, marker batch:0)
    # and crashed before the view publish:
    publish_versioned(old_d.coalesce(1), dim_root)
    dim_after_b0 = apply_snapshot_delta(
        read_latest(spark, dim_root), snapshot_delta(old_d, new_d, ["dk_"]), ["dk_"]
    )
    publish_versioned(dim_after_b0.coalesce(1), dim_root, marker="batch:0")
    _drain_join_mv(spark, tmp_path, feed, view_root, dim_root)
    assert _rows(read_latest(spark, view_root)) == _rows(_view(new_f, new_d))
    assert _rows(read_latest(spark, dim_root)) == _rows(new_d)
    assert latest_marker(spark, dim_root) == "batch:0"  # replay skipped it


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:
    _dim_state = st.dictionaries(
        st.integers(0, 5),
        st.tuples(
            st.sampled_from([None, "a", "b", "c"]),
            st.sampled_from([None, 1.0, 2.5]),
        ),
        max_size=6,
    )
    _fact_state = st.dictionaries(
        st.integers(0, 7),
        st.tuples(
            st.sampled_from([None, 0, 1, 2, 3, 4, 5, 9]),  # 9 = dangling FK
            st.integers(0, 50),
        ),
        max_size=8,
    )

    @settings(max_examples=12, deadline=None)
    @given(_fact_state, _fact_state, _dim_state, _dim_state)
    def test_property_refresh_equals_recompute(
        spark, f_old, f_new, d_old, d_new
    ):
        """For ARBITRARY snapshot transitions (adds/removes/changes on
        both bases, NULL FKs, FK moves, dangling FKs, NULL dim
        attributes, empty snapshots), refresh(view(old), Δf, Δd) must
        equal view(new) recomputed — the operator's whole contract,
        beyond the hand-picked scenarios above."""
        old_f = _fact(spark, [(k, dk, float(a)) for k, (dk, a) in f_old.items()])
        new_f = _fact(spark, [(k, dk, float(a)) for k, (dk, a) in f_new.items()])
        old_d = _dim(spark, [(k, s, sc) for k, (s, sc) in d_old.items()])
        new_d = _dim(spark, [(k, s, sc) for k, (s, sc) in d_new.items()])
        out = _refresh(_view(old_f, old_d), old_f, new_f, old_d, new_d)
        assert _rows(out) == _rows(_view(new_f, new_d))


def test_rejects_missing_key_columns(spark, scenario):
    old_f, new_f, old_d, new_d = scenario
    with pytest.raises(ValueError, match="not a fact column"):
        join_mv_refresh(
            _view(old_f, old_d).drop("dk"),
            None,
            None,
            new_d,
            "fk",
            "dk",
            "dk_",
            ["seg", "score"],
        )


def test_star_rejects_overlapping_or_shadowing_dim_cols(spark):
    """ADVICE r7: star_mv_refresh routes columns BY NAME, so two dims
    claiming the same attribute, a dim attribute shadowing the fact
    key/FK, or a DimSpec column absent from the view must all raise
    instead of silently misrouting the patch/insert projections."""
    from pmp_analytics_spark.operators.diff import DimSpec, star_mv_refresh

    fact = "fk long, d1 long, d2 long, amt double"
    f = spark.createDataFrame([(1, 10, 100, 1.0)], fact)
    d1 = spark.createDataFrame([(10, "a")], "k1 long, seg string")
    d2 = spark.createDataFrame([(100, "x")], "k2 long, grade string")
    mv = (
        f.join(d1, f["d1"] == d1["k1"], "left")
        .join(d2, f["d2"] == d2["k2"], "left")
        .select("fk", "d1", "d2", "amt", "seg", "grade")
    )
    with pytest.raises(ValueError, match="claimed by both"):
        star_mv_refresh(
            mv, None,
            [
                DimSpec(None, d1, "d1", "k1", ["seg"]),
                DimSpec(None, d2, "d2", "k2", ["seg"]),
            ],
            "fk",
        )
    with pytest.raises(ValueError, match="not a fact column"):
        star_mv_refresh(
            mv, None, [DimSpec(None, d1, "d1", "k1", ["seg", "fk"])], "fk"
        )
    with pytest.raises(ValueError, match="not in the view"):
        star_mv_refresh(
            mv, None, [DimSpec(None, d1, "d1", "k1", ["seg", "ghost"])], "fk"
        )
