"""Table maintenance: small-file compaction for parquet directories.

The small-file problem is THE steady-state tax of an append-heavy lake: a
streaming sink or incremental-ingest job (``writers.append_log``,
``streaming/sinks.py``) lands a few files per micro-batch, and a year later
the table is a million 2 MB files — every scan pays a task per file, the
NameNode/object-store listing dominates planning, and row-group statistics
are too fine to prune.

Compaction here follows the shape of Delta/Iceberg ``OPTIMIZE`` but on a
plain parquet directory:

- **Rewrite amplification control**: only files BELOW ``small_threshold``
  (default ``target_bytes // 2``) are rewritten. A table that is already
  well-sized is a no-op — compaction cost is proportional to the small-file
  TAIL, not the table. At 100 TB this is the difference between a nightly
  maintenance job and an impossible full-table churn.
- **No shuffle**: the rewrite reads only the small files and ``coalesce``s
  to ``ceil(small_bytes / target_bytes)`` output files — a narrow
  dependency, zero exchange (pinned by ``tests/test_maintenance.py``).
  Optional ``sort_within`` applies ``sortWithinPartitions`` so the new
  files carry tight min/max stats for pruning — still shuffle-free.
- **Journaled write-then-delete swap**: once the scratch rewrite is
  durable, the to-delete list is recorded in ``_compact_journal.json``
  (atomic tmp+rename) BEFORE any rename; only then are compacted files
  moved in and the old small files deleted. A crash in the swap window
  leaves the journal behind, and the next ``compact_parquet`` call
  finishes the interrupted swap first (re-moves any files still in
  scratch, deletes the journaled old files) — so reruns converge to the
  exact row count, not just structurally. (Serving tables under
  concurrent readers needs a transactional log — Delta/Iceberg — which is
  exactly the gap those formats exist to fill; this operator targets
  pipeline-internal directories owned by one writer, e.g. the append logs
  and ingest sinks in this repo.)

Filesystem access goes through Hadoop's ``FileSystem`` API (via the JVM
gateway), so the same code addresses ``file://``, ``hdfs://`` and any
object-store connector on the cluster's classpath — not ``os.listdir``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CompactionStats:
    """Outcome of one ``compact_parquet`` run (all counts are files)."""

    files_before: int
    files_after: int
    rewritten: int
    skipped: int  # files already >= small_threshold, left in place
    bytes_rewritten: int


def _fs_for(spark: SparkSession, path: str):
    """Hadoop FileSystem + Path for ``path`` (shared gateway helper)."""
    from pmp_analytics_spark.sources.hadoopfs import fs_for

    fs, jpath, jvm, _ = fs_for(spark, path)
    return fs, jpath, jvm


def list_parquet_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) for every ``*.parquet`` data file directly under
    ``path`` (non-recursive — run per leaf/partition directory)."""
    fs, jpath, _ = _fs_for(spark, path)
    out: list[tuple[str, int]] = []
    for st in fs.listStatus(jpath):
        p = st.getPath()
        if st.isFile() and p.getName().endswith(".parquet"):
            out.append((p.toString(), int(st.getLen())))
    return sorted(out)


_JOURNAL = "_compact_journal.json"


def _write_journal(fs, jvm, jroot, to_delete: list[str]) -> None:
    """Atomically (tmp + rename) record the swap's to-delete list inside
    the table directory (underscore name: invisible to readers)."""
    import json

    tmp = jvm.org.apache.hadoop.fs.Path(jroot, _JOURNAL + ".tmp")
    final = jvm.org.apache.hadoop.fs.Path(jroot, _JOURNAL)
    out = fs.create(tmp, True)
    out.write(json.dumps({"to_delete": to_delete}).encode())
    out.close()
    if not fs.rename(tmp, final):
        if fs.exists(final):
            fs.delete(final, False)
        if not fs.rename(tmp, final):
            raise OSError(f"compaction journal write failed in {jroot}")


def _recover_interrupted_swap(spark: SparkSession, path: str) -> bool:
    """Finish a swap a previous run journaled but did not complete: move
    any compacted files still in scratch into the table, delete the
    journaled old small files, drop scratch + journal. No journal (the
    common case, or a crash BEFORE the journal write — scratch debris is
    then stale and rebuilt by the caller) → no-op. Returns whether a
    recovery ran."""
    import json

    fs, jroot, jvm = _fs_for(spark, path)
    journal = jvm.org.apache.hadoop.fs.Path(jroot, _JOURNAL)
    if not fs.exists(journal):
        return False
    from pmp_analytics_spark.sources.writers import _read_small_file

    # _read_small_file feature-detects readAllBytes (Java 9+) with a
    # byte-loop fallback, so crash recovery itself works on a Java 8
    # gateway too.
    to_delete = json.loads(_read_small_file(fs, journal))["to_delete"]
    scratch = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "/_compact_tmp")
    if fs.exists(scratch):
        moved = 0
        for st in fs.listStatus(scratch):
            p = st.getPath()
            # Scratch part names carry Spark's per-task UUID, so the
            # recovery prefix cannot collide with already-moved files.
            if st.isFile() and p.getName().endswith(".parquet"):
                dest = jvm.org.apache.hadoop.fs.Path(
                    jroot, f"compacted-r{moved:05d}-{p.getName()}"
                )
                if not fs.rename(p, dest):
                    raise OSError(f"recovery rename failed: {p} -> {dest}")
                moved += 1
        fs.delete(scratch, True)
    for p in to_delete:
        jp = jvm.org.apache.hadoop.fs.Path(p)
        if fs.exists(jp):
            fs.delete(jp, False)
    fs.delete(journal, False)
    return True


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    small_threshold: int | None = None,
    sort_within: list[str] | None = None,
) -> CompactionStats:
    """Compact the small-file tail of the parquet directory ``path``.

    Files ``>= small_threshold`` (default ``target_bytes // 2``) are left
    untouched; the rest are read, coalesced into ``ceil(bytes / target)``
    outputs (no shuffle), optionally ``sortWithinPartitions(sort_within)``
    for min/max pruning, and swapped in (write new → delete old).
    """
    small_threshold = (
        target_bytes // 2 if small_threshold is None else small_threshold
    )
    _recover_interrupted_swap(spark, path)
    files = list_parquet_files(spark, path)
    small = [(p, n) for p, n in files if n < small_threshold]
    if len(small) <= 1:
        return CompactionStats(len(files), len(files), 0, len(files), 0)

    small_bytes = sum(n for _, n in small)
    n_out = max(1, math.ceil(small_bytes / target_bytes))

    fs, jroot, jvm = _fs_for(spark, path)
    # Scratch lives INSIDE the directory under an underscore name: Spark's
    # readers and partition discovery ignore _-prefixed entries, and
    # compact_partitioned's walk skips it — so a crash mid-compaction
    # leaves the table readable and the rerun converges (stale scratch is
    # deleted and rebuilt below). A SIBLING scratch (old shape:
    # "<leaf>._compact_tmp") would partition-parse as a bogus partition
    # value and double-count rows after a crash.
    scratch = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "/_compact_tmp")
    if fs.exists(scratch):  # debris from a crashed run: stale, rebuildable
        fs.delete(scratch, True)

    df = spark.read.parquet(*[p for p, _ in small]).coalesce(n_out)
    if sort_within:
        df = df.sortWithinPartitions(*sort_within)
    df.write.mode("overwrite").parquet(scratch.toString())

    # Journal the swap BEFORE touching any live file: the scratch rewrite
    # is durable at this point, so recording the to-delete list makes the
    # whole swap resumable — a crash anywhere below leaves the journal,
    # and the next run's _recover_interrupted_swap finishes the moves and
    # deletes instead of re-compacting the (still present) small files
    # alongside their already-moved copies, which would duplicate rows.
    _write_journal(fs, jvm, jroot, [p for p, _ in small])

    moved = 0
    for st in fs.listStatus(scratch):
        p = st.getPath()
        if st.isFile() and p.getName().endswith(".parquet"):
            dest = jvm.org.apache.hadoop.fs.Path(
                jroot, f"compacted-{moved:05d}-{p.getName()}"
            )
            if not fs.rename(p, dest):
                raise OSError(f"compaction rename failed: {p} -> {dest}")
            moved += 1
    for p, _ in small:
        fs.delete(jvm.org.apache.hadoop.fs.Path(p), False)
    fs.delete(scratch, True)
    fs.delete(jvm.org.apache.hadoop.fs.Path(jroot, _JOURNAL), False)

    return CompactionStats(
        files_before=len(files),
        files_after=len(files) - len(small) + moved,
        rewritten=len(small),
        skipped=len(files) - len(small),
        bytes_rewritten=small_bytes,
    )


def compact_partitioned(
    spark: SparkSession,
    root: str,
    target_bytes: int = 128 * 1024 * 1024,
    small_threshold: int | None = None,
    sort_within: list[str] | None = None,
) -> dict[str, CompactionStats]:
    """Run ``compact_parquet`` independently in every hive-style leaf
    partition directory under ``root`` (``k=v`` path segments). Each
    partition compacts in isolation — partition values live in the path,
    so mixing files across partitions would corrupt the table."""
    fs, jroot, jvm = _fs_for(spark, root)
    leaves: list[str] = []

    def walk(jdir) -> None:
        subdirs = [
            st.getPath()
            for st in fs.listStatus(jdir)
            if st.isDirectory()
            and "=" in st.getPath().getName()
            and not st.getPath().getName().startswith(("_", "."))
        ]
        if not subdirs:
            leaves.append(jdir.toString())
            return
        for d in subdirs:
            walk(d)

    walk(jroot)
    return {
        leaf: compact_parquet(
            spark, leaf, target_bytes, small_threshold, sort_within
        )
        for leaf in leaves
    }
