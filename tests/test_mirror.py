"""File mirror (`sources/mirror.py`) and clipboard sink (`writers.py`):
the reference's SFTP-backup compare rule (new-or-newer → copy, else skip,
age-gated) and write_clipboard TSV semantics, dependency-free."""

from __future__ import annotations

import os

import pytest

from pmp_analytics_spark.sources.mirror import mirror_directory, sftp_mirror
from pmp_analytics_spark.sources.writers import clipboard_tsv


def _write(path, body):
    with open(path, "w") as fh:
        fh.write(body)


def test_mirror_copy_update_skip(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    os.makedirs(src)
    _write(os.path.join(src, "a.csv"), "a,1\n")
    _write(os.path.join(src, "b.csv"), "b,2\n")

    s1 = mirror_directory(spark, src, dst)
    assert sorted(s1.copied) == ["a.csv", "b.csv"] and not s1.updated
    assert open(os.path.join(dst, "a.csv")).read() == "a,1\n"

    # Unchanged second pass: everything skips (the incremental contract).
    s2 = mirror_directory(spark, src, dst)
    assert s2.skipped == 2 and not s2.copied and not s2.updated

    # Touch a source file newer than the destination copy -> re-copy.
    _write(os.path.join(src, "a.csv"), "a,999\n")
    dst_mtime = os.path.getmtime(os.path.join(dst, "a.csv"))
    os.utime(os.path.join(src, "a.csv"), (dst_mtime + 10, dst_mtime + 10))
    s3 = mirror_directory(spark, src, dst)
    assert s3.updated == ["a.csv"] and s3.skipped == 1
    assert open(os.path.join(dst, "a.csv")).read() == "a,999\n"


def test_mirror_age_gate_and_delete_removed(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    os.makedirs(src)
    _write(os.path.join(src, "fresh.txt"), "f")
    _write(os.path.join(src, "stale.txt"), "s")
    old = os.path.getmtime(os.path.join(src, "stale.txt")) - 48 * 3600
    os.utime(os.path.join(src, "stale.txt"), (old, old))

    s = mirror_directory(spark, src, dst, max_age_hours=24)
    assert s.copied == ["fresh.txt"] and s.too_old == 1

    # Full-mirror mode: a file gone from the source leaves the mirror.
    _write(os.path.join(dst, "orphan.txt"), "o")
    s2 = mirror_directory(spark, src, dst, max_age_hours=24, delete_removed=True)
    assert s2.deleted == ["orphan.txt"]
    assert not os.path.exists(os.path.join(dst, "orphan.txt"))


def test_sftp_binding_gated(spark):
    with pytest.raises(NotImplementedError, match="paramiko"):
        sftp_mirror()


def test_clipboard_tsv_shape_and_guard(spark):
    df = spark.createDataFrame(
        [(1, "a\tb", None), (2, "x\ny", 3.5)], ["id", "s", "v"]
    )
    text = clipboard_tsv(df.orderBy("id"))
    lines = text.split("\n")
    assert lines[0] == "id\ts\tv"
    assert lines[1] == "1\ta b\t"  # tab/newline sanitized, null -> empty
    assert lines[2] == "2\tx y\t3.5"
    assert clipboard_tsv(df, include_header=False).count("\n") == 1

    with pytest.raises(ValueError, match="small outputs"):
        clipboard_tsv(spark.range(100), max_rows=10)


def test_sheet_append_range_math_and_serialization(spark):
    import datetime

    from pmp_analytics_spark.sources.sheets import (
        SheetsTransport,
        _col_letter,
        sheet_append,
    )

    calls = []
    store = {"colA": [["hdr"], ["r2"], ["r3"]]}  # 3 used rows
    t = SheetsTransport(
        get_values=lambda sid, rng: store["colA"],
        update_values=lambda sid, rng, vals: calls.append((sid, rng, vals)),
    )
    df = spark.createDataFrame(
        [(1, "a", None, datetime.date(2026, 1, 2)), (2, "b", 3.5, None)],
        ["id", "s", "v", "d"],
    )
    rng = sheet_append(df.orderBy("id"), "SID", "3x3", t)
    assert rng == "3x3!A4:D5"  # below the 3 used rows, 4 cols, 2 rows
    (sid, got_rng, vals), = calls
    assert sid == "SID" and got_rng == rng
    assert vals == [[1, "a", "", "2026-01-02"], [2, "b", 3.5, ""]]

    # Empty sheet: reference quirk — probe says last_row=1, append at A2.
    store["colA"] = []
    calls.clear()
    assert sheet_append(df.limit(1), "SID", "s", t) == "s!A2:D2"

    # Column letters past Z.
    assert _col_letter(1) == "A" and _col_letter(26) == "Z"
    assert _col_letter(27) == "AA" and _col_letter(52) == "AZ"

    # Empty frame: nothing written.
    calls.clear()
    sheet_append(df.where("id < 0"), "SID", "s", t)
    assert not calls


def test_sheet_append_guard_and_gated_transport(spark):
    import pytest as _pytest

    from pmp_analytics_spark.sources.sheets import (
        SheetsTransport,
        googleapi_transport,
        sheet_append,
    )

    t = SheetsTransport(get_values=lambda *a: [], update_values=lambda *a: None)
    with _pytest.raises(ValueError, match="small outputs"):
        sheet_append(spark.range(50), "SID", "s", t, max_rows=10)
    with _pytest.raises(NotImplementedError, match="google-api-python-client"):
        googleapi_transport(creds=None)
