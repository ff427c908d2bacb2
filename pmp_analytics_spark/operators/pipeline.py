"""Resumable stage-materialized batch pipelines.

A 100 TB funnel (gate → fingerprint → dedup → pack) can run for hours; a
failure in stage 4 must not recompute stages 1-3. Lazy Spark gives the
opposite default — one giant plan that restarts from the scan — so long
pipelines materialize stage boundaries and resume from the last completed
one. This operator makes that pattern explicit and safe:

- each stage writes ``workdir/{idx:02d}-{name}`` once; parquet's
  ``_SUCCESS`` marker is the completed flag (a crashed half-write has no
  marker and is rewritten on resume),
- a completed stage is READ, not recomputed — resume cost is one scan of
  the last checkpoint, not the upstream compute,
- materialization also cuts lineage (the OOM/stack antidote for iterative
  or very deep plans) and gives each stage its own AQE-sized output.

Invalidation is the caller's contract: the workdir encodes the pipeline
version (put a content/config hash in the path); changing logic without
changing the workdir resumes stale checkpoints, same as every
checkpoint system. ``force_from`` re-runs a suffix explicitly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

Stage = tuple[str, Callable[[DataFrame | None], DataFrame]]


def run_stages(
    spark: SparkSession,
    stages: list[Stage],
    workdir: str,
    force_from: str | None = None,
) -> tuple[DataFrame, list[str]]:
    """Run ``stages`` in order with parquet materialization between them.

    Each stage callable receives the PREVIOUS stage's materialized frame
    (None for the first) and returns its output frame. Returns the final
    frame and the list of stage names actually COMPUTED this run
    (completed checkpoints are skipped unless ``force_from`` names the
    first stage to recompute — everything after it recomputes too, since
    its input changed)."""
    from pmp_analytics_spark.sources.hadoopfs import fs_for

    if force_from is not None and force_from not in {n for n, _ in stages}:
        raise ValueError(
            f"force_from={force_from!r} names no stage — refusing to resume "
            "checkpoints the caller asked to invalidate"
        )
    fs, _, jvm, _ = fs_for(spark, workdir)
    computed: list[str] = []
    prev: DataFrame | None = None
    forcing = False
    for idx, (name, fn) in enumerate(stages):
        if force_from is not None and name == force_from:
            forcing = True
        path = f"{workdir.rstrip('/')}/{idx:02d}-{name}"
        marker = jvm.org.apache.hadoop.fs.Path(path + "/_SUCCESS")
        if not forcing and fs.exists(marker):
            prev = spark.read.parquet(path)
            continue
        # Once one stage recomputes, every later stage must too — its
        # input changed, so a surviving downstream checkpoint is STALE
        # (the dangerous case: a mid checkpoint lost but later ones
        # present; skipping them would silently mix pipeline versions).
        forcing = True
        out = fn(prev)
        out.write.mode("overwrite").parquet(path)
        computed.append(name)
        prev = spark.read.parquet(path)
    assert prev is not None, "run_stages needs at least one stage"
    return prev, computed
