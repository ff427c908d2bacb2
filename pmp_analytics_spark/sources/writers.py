"""Sink patterns (SURVEY.md §2.2).

The reference writes ~30 single-file CSVs (K1, ``df.write_csv``), pipe-
delimited extracts (K2), and maintains append-only logs by concat-and-
rewrite. Spark-first equivalents:

- ``write_csv``: distributed CSV (one file per partition) — the ONLY
  shape that scales; a 100 TB result cannot be one file.
- ``write_csv_single``: the reference's exact one-file semantics via
  ``coalesce(1)`` — documented as driver-adjacent (single task writes
  everything) and intended for small, already-aggregated outputs, which
  is how the reference uses it (notices, board lists).
- ``append_log``: the log-maintenance pattern as an append-mode parquet
  write — no read-modify-write cycle, safe under concurrent runs
  (each batch adds files; readers see a consistent snapshot per query).

Excel formatting / Google Sheets / clipboard sinks are presentation-layer
storage integrations, out of scope per BASELINE.json.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame


def write_csv(df: DataFrame, path: str, sep: str = ",", header: bool = True, mode: str = "overwrite") -> None:
    """Distributed CSV write (one part-file per partition)."""
    df.write.mode(mode).option("sep", sep).option("header", header).csv(path)


def write_csv_single(df: DataFrame, path: str, sep: str = ",", header: bool = True) -> str:
    """Single-file CSV with the reference's ``write_csv(path)`` semantics
    (K1): coalesce to one partition, write, then move the part file to
    ``path``. One task writes all rows — only for small outputs."""
    tmp = path + ".spark-tmp"
    df.coalesce(1).write.mode("overwrite").option("sep", sep).option("header", header).csv(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    shutil.move(part, path)
    shutil.rmtree(tmp)
    return path


def write_pipe_delimited(df: DataFrame, path: str) -> str:
    """K2: the reference's ``separator='|'`` extract shape."""
    return write_csv_single(df, path, sep="|")


def append_log(new_rows: DataFrame, log_path: str) -> None:
    """Append-only log maintenance (replaces concat-and-rewrite,
    delinquent_data_submitters.py:224-244)."""
    new_rows.write.mode("append").parquet(log_path)
