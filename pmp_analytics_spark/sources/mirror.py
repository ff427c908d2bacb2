"""One-way file mirror: the reference's SFTP backup semantics
(sftp_backup.py:29-99 — copy a file when it is new or its source mtime is
newer than the destination's, skip it otherwise, optionally only touching
files modified within an age window) re-expressed over Hadoop's
``FileSystem`` API.

Running it over Hadoop FS instead of a paramiko socket loop is the
Spark-native generalization: the same code mirrors ``file://`` ↔
``hdfs://`` ↔ any object-store connector on the classpath, and Hadoop
ships an optional ``sftp://`` FileSystem for deployments that need the
literal protocol. The incremental rule (size+mtime compare, newer wins)
is what makes a nightly mirror O(changed files), not O(directory).

The transfer itself is driver-side streaming copy (``FileUtil.copy``) —
mirroring is I/O shuttling, not dataframe compute, and the reference's
loop is likewise single-node; a petabyte-scale variant would hand the
per-file copy list to ``spark.sparkContext.parallelize(...).foreach``
with the same compare rule (noted here rather than built: DistCp already
owns that niche).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class MirrorStats:
    copied: list[str] = field(default_factory=list)
    updated: list[str] = field(default_factory=list)
    skipped: int = 0
    deleted: list[str] = field(default_factory=list)
    too_old: int = 0


def _fs(spark, path: str):
    from pmp_analytics_spark.sources.hadoopfs import fs_for

    return fs_for(spark, path)


def mirror_directory(
    spark,
    src: str,
    dst: str,
    max_age_hours: float | None = None,
    delete_removed: bool = False,
    now_ms: int | None = None,
) -> MirrorStats:
    """Mirror the files directly under ``src`` into ``dst``.

    - missing in ``dst`` → copy (``stats.copied``)
    - present but source (mtime, size) is newer/different → re-copy
      (``stats.updated``)
    - otherwise → skip
    - ``max_age_hours``: only consider source files modified within the
      window (the reference's ``--age`` gate; ``now_ms`` injectable for
      tests)
    - ``delete_removed``: files in ``dst`` with no source counterpart are
      deleted (full-mirror mode; default off, matching the reference's
      append-only backup)
    """
    import time

    src_fs, src_path, jvm, conf = _fs(spark, src)
    dst_fs, dst_path, _, _ = _fs(spark, dst)
    if not dst_fs.exists(dst_path):
        dst_fs.mkdirs(dst_path)
    now = int(time.time() * 1000) if now_ms is None else now_ms

    stats = MirrorStats()
    src_names = set()
    for st in src_fs.listStatus(src_path):
        if not st.isFile():
            continue
        name = st.getPath().getName()
        src_names.add(name)
        if (
            max_age_hours is not None
            and now - st.getModificationTime() > max_age_hours * 3600_000
        ):
            stats.too_old += 1
            continue
        target = jvm.org.apache.hadoop.fs.Path(dst_path, name)
        if dst_fs.exists(target):
            dst_st = dst_fs.getFileStatus(target)
            if (
                st.getModificationTime() <= dst_st.getModificationTime()
                and st.getLen() == dst_st.getLen()
            ):
                stats.skipped += 1
                continue
            bucket = stats.updated
        else:
            bucket = stats.copied
        jvm.org.apache.hadoop.fs.FileUtil.copy(
            src_fs, st.getPath(), dst_fs, target, False, True, conf
        )
        bucket.append(name)
    if delete_removed:
        for st in dst_fs.listStatus(dst_path):
            name = st.getPath().getName()
            if st.isFile() and name not in src_names:
                dst_fs.delete(st.getPath(), False)
                stats.deleted.append(name)
    return stats


def sftp_mirror(*args, **kwargs):  # pragma: no cover - dependency absent here
    """Literal-SFTP binding of the mirror (reference sftp_backup.py): needs
    ``paramiko``, which this environment does not ship. Deployments with
    Hadoop's sftp connector can instead pass an ``sftp://`` URI straight
    to ``mirror_directory`` — same compare rule, no extra dependency."""
    try:
        import paramiko  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "sftp_mirror needs paramiko (not installed); use "
            "mirror_directory with an sftp:// Hadoop URI or install paramiko"
        ) from exc
    raise NotImplementedError(
        "paramiko transport binding intentionally not implemented in this "
        "repo; mirror_directory covers the semantics over Hadoop FS"
    )
