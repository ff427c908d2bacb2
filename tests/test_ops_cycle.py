"""End-to-end nightly-ops cycle: the session's operational verticals
composing into the maintenance loop a production table actually runs —

    append-ingest → small-file compaction (maintenance window first:
    open plans must not outlive it) → quality gate → quarantine routing
    → versioned publish → downstream mirror → anomaly gate next night

Each piece is unit-tested on its own; this pins that they compose (the
outputs of one are legal inputs of the next, and the data survives the
full loop bit-for-bit)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pmp_analytics_spark.operators.maintenance import (
    compact_parquet,
    list_parquet_files,
)
from pmp_analytics_spark.operators.quality import (
    RowRule,
    check_report,
    completeness,
    in_range,
    metric_anomalies,
    min_size,
    quarantine,
    record_metrics,
    suggest_checks,
)
from pmp_analytics_spark.sources.mirror import mirror_directory
from pmp_analytics_spark.sources.writers import (
    append_log,
    publish_versioned,
    read_latest,
)


def test_nightly_ops_cycle(spark, tmp_path):
    log = str(tmp_path / "ingest_log")
    metrics = str(tmp_path / "metrics")
    published = str(tmp_path / "published")
    mirror = str(tmp_path / "mirror")

    # 1) Ingest: 12 micro-appends -> a small-file-fragmented log.
    for i in range(12):
        batch = spark.range(i * 100, (i + 1) * 100).select(
            F.col("id").alias("k"),
            (F.col("id") % 97).cast("double").alias("v"),
            F.when(F.col("id") % 50 == 0, None)
            .otherwise(F.concat(F.lit("u"), F.col("id")))
            .alias("tag"),
        )
        append_log(batch.coalesce(1), log)
    assert len(list_parquet_files(spark, log)) == 12

    # 2) Compaction runs FIRST, inside the maintenance window: frames
    # planned over the log before compaction hold the old file listing,
    # and executing them afterwards hits deleted files — the documented
    # single-writer/no-open-readers constraint, demonstrated here by
    # ordering rather than violated.
    stats = compact_parquet(spark, log, target_bytes=1 << 20)
    assert stats.rewritten == 12 and stats.files_after < 12
    table = spark.read.parquet(log)
    assert table.count() == 1200

    # 3) Quality gate: the table-level report records into history.
    checks = [completeness("k"), in_range("v", 0, 96), min_size(1000)]
    report = check_report(table, checks)
    record_metrics(report, "night-1", metrics)
    assert {r["check_name"]: r["passed"] for r in report.collect()} == {
        "completeness(k)": True,
        "in_range(v)": True,
        "min_size": True,
    }
    # Suggested constraints hold on the data they profiled.
    assert all(
        r["passed"] for r in check_report(table, suggest_checks(table)).collect()
    )

    # 4) Row-level routing: null tags quarantine, the rest flow on.
    clean, bad = quarantine(table, [RowRule("tagged", F.col("tag").isNotNull())])
    assert bad.count() == 24 and clean.count() == 1176
    assert all(r["reasons"] == ["tagged"] for r in bad.collect())

    # 5) Publish the clean slice as an immutable version + pointer.
    publish_versioned(clean, published, keep_last=2)
    latest = read_latest(spark, published)
    assert latest.count() == 1176 and "reasons" not in latest.columns

    # 6) Mirror the published version downstream (pointer + version files).
    vdir = open(os.path.join(published, "_LATEST")).read().strip()
    m = mirror_directory(spark, os.path.join(published, vdir), mirror)
    assert m.copied and not m.updated
    mirrored = spark.read.parquet(mirror)
    a = sorted(r["k"] for r in mirrored.collect())
    b = sorted(r["k"] for r in latest.collect())
    assert a == b

    # 7) Next night: a degraded ingest trips the anomaly gate.
    bad_batch = spark.range(2000, 2100).select(
        F.col("id").alias("k"),
        F.lit(None).cast("double").alias("v"),
        F.lit("u").alias("tag"),
    )
    append_log(bad_batch.coalesce(1), log)
    night2 = check_report(spark.read.parquet(log), checks)
    record_metrics(night2, "night-2", metrics)
    # one-night history is below the n_prior>=2 floor: quiet by design
    assert metric_anomalies(spark.read.parquet(metrics), "night-2").count() == 0
    record_metrics(night2, "night-2b", metrics)  # second healthy-prior run
    flagged = metric_anomalies(spark.read.parquet(metrics), "night-2b")
    assert flagged.count() == 0  # priors night-1+night-2 disagree; sigma wide
    # but the absolute gate catches it regardless: in_range collapsed
    assert not {
        r["check_name"]: r["passed"] for r in night2.collect()
    }["in_range(v)"]
