"""Small-file compaction (`operators/maintenance.py`).

Pins the three contracts that make compaction safe to run nightly at
100 TB: losslessness (same rows before/after), rewrite-amplification
control (well-sized files are NOT rewritten), and the no-shuffle rewrite
plan (coalesce, zero Exchange).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from pmp_analytics_spark.operators.maintenance import (
    compact_parquet,
    compact_partitioned,
    list_parquet_files,
)

def _rows_fingerprint(spark, path):
    df = spark.read.parquet(path)
    cols = [F.col(c).cast("string") for c in sorted(df.columns)]
    return (
        df.select(
            F.sum(F.crc32(F.concat_ws("\x1f", *cols))).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).first()
    )


def test_compaction_lossless_and_skips_big_files(spark):
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "events")

        def payload(n):
            return spark.range(n).select(
                F.col("id"), F.md5(F.col("id").cast("string")).alias("s")
            )

        # 32 small files + one pre-sized big file appended on top.
        payload(2_000).repartition(32).write.parquet(path)
        payload(200_000).coalesce(1).write.mode("append").parquet(path)

        before = _rows_fingerprint(spark, path)
        files0 = list_parquet_files(spark, path)
        big0 = {p for p, n in files0 if n >= 50_000}
        assert len(files0) == 33 and len(big0) == 1

        stats = compact_parquet(
            spark, path, target_bytes=100_000, small_threshold=50_000
        )
        assert stats.files_before == 33
        assert stats.rewritten == 32 and stats.skipped == 1
        assert stats.files_after < 33

        files1 = list_parquet_files(spark, path)
        assert len(files1) == stats.files_after
        # The big file was not rewritten — same path survives untouched.
        assert big0 <= {p for p, _ in files1}
        assert _rows_fingerprint(spark, path) == before


def test_compaction_idempotent_noop_when_wellsized(spark):
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "t")
        spark.range(1000).write.parquet(path)
        compact_parquet(spark, path, target_bytes=1 << 20)
        files = list_parquet_files(spark, path)
        stats = compact_parquet(spark, path, target_bytes=1 << 20)
        assert stats.rewritten == 0
        assert list_parquet_files(spark, path) == files  # byte-stable no-op


def test_compaction_rewrite_plan_has_no_exchange(spark):
    # The rewrite is read-small-files -> coalesce -> write: a narrow plan.
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "t")
        spark.range(5000).withColumn("k", F.col("id") % 7).repartition(
            16
        ).write.parquet(path)
        small = [p for p, _ in list_parquet_files(spark, path)]
        plan = (
            spark.read.parquet(*small)
            .coalesce(2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


def test_compaction_sort_within_tightens_stats(spark):
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "t")
        spark.range(20000).select(
            (F.crc32(F.col("id").cast("string")) % 1000).alias("k")
        ).repartition(16).write.parquet(path)
        compact_parquet(
            spark, path, target_bytes=1 << 20, sort_within=["k"]
        )
        [(fp, _)] = list_parquet_files(spark, path)
        md = pq.ParquetFile(fp.removeprefix("file:")).metadata
        col0 = md.row_group(0).column(0).statistics
        # Sorted rewrite -> row-group min/max actually narrow (prunable).
        assert col0.has_min_max


def test_compact_partitioned_per_leaf(spark):
    with tempfile.TemporaryDirectory() as tmp:
        root = os.path.join(tmp, "pt")
        df = spark.range(8000).select(
            (F.col("id") % 3).alias("p"), F.col("id").alias("v")
        )
        df.repartition(10).write.partitionBy("p").parquet(root)
        before = _rows_fingerprint(spark, root)
        stats = compact_partitioned(spark, root, target_bytes=1 << 20)
        assert len(stats) == 3
        assert all(s.rewritten > 0 for s in stats.values())
        assert all(s.files_after == 1 for s in stats.values())
        assert _rows_fingerprint(spark, root) == before


def test_compaction_crash_debris_invisible_and_rerun_converges(spark):
    """A scratch dir left by a crashed run must be invisible to Spark
    readers of the partitioned table (underscore-prefixed, INSIDE the
    leaf) and must not break or double-count the rerun."""
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        root = os.path.join(tmp, "pt")
        df = spark.range(3000).select(
            (F.col("id") % 2).alias("p"), F.col("id").alias("v")
        )
        df.repartition(6).write.partitionBy("p").parquet(root)
        before = _rows_fingerprint(spark, root)

        # Simulate a crash: stale scratch with data inside one leaf.
        leaf = os.path.join(root, "p=0")
        spark.range(500).write.parquet(os.path.join(leaf, "_compact_tmp"))

        # Readers do not see the debris (row set unchanged)...
        assert _rows_fingerprint(spark, root) == before
        # ...and the rerun converges: debris rebuilt, table intact.
        stats = compact_partitioned(spark, root, target_bytes=1 << 20)
        # Hadoop reports leaves as file: URIs; debris dir is NOT a leaf.
        assert {k.removeprefix("file:") for k in stats} == {
            leaf,
            os.path.join(root, "p=1"),
        }
        assert _rows_fingerprint(spark, root) == before
        assert not os.path.exists(os.path.join(leaf, "_compact_tmp"))


def test_compaction_journal_recovery_no_duplicate_rows(spark):
    """A crash in the swap window (scratch durable + journal written, but
    renames/deletes incomplete) must NOT duplicate rows on rerun: the next
    compact_parquet finishes the journaled swap first — moves scratch
    files in, deletes the journaled old small files — instead of
    re-compacting the still-present old files next to their copies."""
    import json

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "t")
        spark.range(2000).selectExpr("id", "id * 2 AS v").repartition(
            8
        ).write.parquet(path)
        before = _rows_fingerprint(spark, path)
        files = list_parquet_files(spark, path)

        # Crash point 1: scratch rewrite complete, journal written, zero
        # renames done, old small files all still present.
        scratch = os.path.join(path, "_compact_tmp")
        spark.read.parquet(*[p for p, _ in files]).coalesce(2).write.parquet(
            scratch
        )
        with open(os.path.join(path, "_compact_journal.json"), "w") as fh:
            json.dump({"to_delete": [p for p, _ in files]}, fh)

        stats = compact_parquet(spark, path, target_bytes=1 << 26)
        assert _rows_fingerprint(spark, path) == before
        assert not os.path.exists(os.path.join(path, "_compact_journal.json"))
        assert not os.path.exists(scratch)
        # Recovery produced exactly the scratch's 2 files; nothing left
        # small enough to rewrite twice.
        assert stats.files_before == 2


def test_compaction_journal_recovery_partial_renames(spark):
    """Crash point 2: some compacted files already renamed in, the rest
    still in scratch, journal present. Recovery must move the remainder
    and delete the old files exactly once — byte-identical row set."""
    import json
    import shutil

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "t")
        spark.range(3000).selectExpr("id", "id * 3 AS v").repartition(
            6
        ).write.parquet(path)
        before = _rows_fingerprint(spark, path)
        files = list_parquet_files(spark, path)

        scratch = os.path.join(path, "_compact_tmp")
        spark.read.parquet(*[p for p, _ in files]).coalesce(3).write.parquet(
            scratch
        )
        with open(os.path.join(path, "_compact_journal.json"), "w") as fh:
            json.dump({"to_delete": [p for p, _ in files]}, fh)
        # Simulate one completed rename before the crash.
        parts = sorted(
            f for f in os.listdir(scratch) if f.endswith(".parquet")
        )
        shutil.move(
            os.path.join(scratch, parts[0]),
            os.path.join(path, f"compacted-00000-{parts[0]}"),
        )

        compact_parquet(spark, path, target_bytes=1 << 26)
        assert _rows_fingerprint(spark, path) == before
        assert not os.path.exists(os.path.join(path, "_compact_journal.json"))
        assert not os.path.exists(scratch)
