"""Shared Hadoop FileSystem gateway helper for filesystem-touching
operators (compaction, mirroring). One place to resolve a path's
FileSystem so connector quirks get fixed once."""

from __future__ import annotations


def fs_for(spark, path: str):
    """(FileSystem, Path, jvm, hadoopConfiguration) for ``path``."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    return jpath.getFileSystem(conf), jpath, jvm, conf
