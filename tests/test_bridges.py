"""S4/S5 ingestion bridges: xlsx + HTML-table → all-string DataFrames.

The xlsx fixture is written as raw Office Open XML parts (the container
has no Excel writer either) with the features the reference's files
exercise: a named sheet among several, junk rows above the header
(header_row=4, the permit_inspection_licenses.py:19 shape), shared and
inline strings, numeric cells, and sparse rows that skip empty cells.
"""

from __future__ import annotations

import zipfile

import pytest

from pmp_analytics_spark.sources.bridges import (
    read_excel_bridge,
    read_html_table_bridge,
    write_excel_bridge,
)

_WB = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
 <sheets>
  <sheet name="summary" sheetId="1" r:id="rId1"/>
  <sheet name="input" sheetId="2" r:id="rId2"/>
 </sheets>
</workbook>"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
 <Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
</Relationships>"""

_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
 <Default Extension="xml" ContentType="application/xml"/>
 <Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
</Types>"""

_SST = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
 <si><t>Permit #</t></si>
 <si><t>Status</t></si>
 <si><t>P-001</t></si>
 <si><r><t>OP</t></r><r><t>EN</t></r></si>
</sst>"""

# decoy first sheet: the bridge must resolve by NAME through the rels,
# not take the first worksheet part in the zip
_SHEET1 = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1"><c r="A1" t="inlineStr"><is><t>WRONG SHEET</t></is></c></row>
 </sheetData>
</worksheet>"""

# 4 junk rows, header on row index 4, data with: shared string, rich-text
# shared string, inline string, numeric, sparse row skipping column B
_SHEET2 = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1"><c r="A1" t="inlineStr"><is><t>Inspection Tracker</t></is></c></row>
  <row r="2"/>
  <row r="3"><c r="A3" t="inlineStr"><is><t>exported 2026-01-31</t></is></c></row>
  <row r="4"/>
  <row r="5"><c r="A5" t="s"><v>0</v></c><c r="B5" t="s"><v>1</v></c><c r="C5" t="inlineStr"><is><t>Count</t></is></c></row>
  <row r="6"><c r="A6" t="s"><v>2</v></c><c r="B6" t="s"><v>3</v></c><c r="C6"><v>12</v></c></row>
  <row r="7"><c r="A7" t="inlineStr"><is><t>P-002</t></is></c><c r="C7"><v>3.5</v></c></row>
 </sheetData>
</worksheet>"""

_HTML = """<html><body>
<p>export header junk</p>
<table>
 <tr><td colspan="2">Technician Licenses</td></tr>
 <tr><th>License</th><th>Status</th><th>Issue Date</th></tr>
 <tr><td> T-10 </td><td>Open - Active</td><td>01/15/2026</td></tr>
 <tr><td>T-11</td><td colspan="2">Superseded</td></tr>
 <tr><td>T-12</td><td></td><td>02/01/2026</td></tr>
</table>
<table><tr><th>other</th></tr><tr><td>table</td></tr></table>
</body></html>"""


@pytest.fixture(scope="module")
def xlsx_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("bridges") / "tracker.xlsx"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("[Content_Types].xml", _TYPES)
        zf.writestr("xl/workbook.xml", _WB)
        zf.writestr("xl/_rels/workbook.xml.rels", _RELS)
        zf.writestr("xl/sharedStrings.xml", _SST)
        zf.writestr("xl/worksheets/sheet1.xml", _SHEET1)
        zf.writestr("xl/worksheets/sheet2.xml", _SHEET2)
    return str(p)


def test_excel_bridge_header_offset_all_string(spark, xlsx_path):
    df = read_excel_bridge(spark, xlsx_path, sheet_name="input", header_row=4)
    assert df.columns == ["Permit #", "Status", "Count"]
    assert all(t == "string" for _, t in df.dtypes)  # infer_schema_length=0
    rows = [tuple(r) for r in df.collect()]
    # rich-text shared string joins runs; numbers stay raw strings;
    # the sparse row surfaces the skipped cell as null
    assert rows == [("P-001", "OPEN", "12"), ("P-002", None, "3.5")]


def test_excel_bridge_resolves_sheet_by_name(spark, xlsx_path):
    first = read_excel_bridge(spark, xlsx_path)  # default: first by workbook order
    assert first.columns == ["WRONG SHEET"]
    with pytest.raises(ValueError, match="not found"):
        read_excel_bridge(spark, xlsx_path, sheet_name="nope")


def test_html_bridge_matches_read_html_shape(spark, tmp_path):
    p = tmp_path / "techs.xls"  # .xls that is really HTML, as in techs.py
    p.write_text(_HTML)
    df = read_html_table_bridge(spark, str(p), table_index=0, header_row=1)
    assert df.columns == ["License", "Status", "Issue Date"]
    rows = [tuple(r) for r in df.collect()]
    assert rows == [
        ("T-10", "Open - Active", "01/15/2026"),  # whitespace collapsed
        ("T-11", "Superseded", "Superseded"),  # colspan repeats the value
        ("T-12", None, "02/01/2026"),  # empty cell -> null
    ]
    other = read_html_table_bridge(spark, str(p), table_index=1)
    assert other.columns == ["other"]
    with pytest.raises(ValueError, match="table"):
        read_html_table_bridge(spark, str(p), table_index=2)


def test_excel_write_roundtrips_through_read_bridge(spark, tmp_path):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "Board <A> & Co", 12.5), (2, None, 3.0), (3, 'say "hi"', None)],
        ["id", "name", "score"],
    ).withColumn("id", F.col("id").cast("long"))
    p = str(tmp_path / "report.xlsx")
    assert write_excel_bridge(df, p, sheet_name="extract") == 3

    back = read_excel_bridge(spark, p, sheet_name="extract")
    assert back.columns == ["id", "name", "score"]
    rows = sorted(tuple(r) for r in back.collect())
    # all-string on re-read (the infer_schema_length=0 contract); nulls
    # survive as missing cells; XML-special characters escape correctly
    assert rows == [
        ("1", "Board <A> & Co", "12.5"),
        ("2", None, "3.0"),
        ("3", 'say "hi"', None),
    ]


def test_excel_write_refuses_unbounded_extract(spark):
    df = spark.range(0, 20).withColumnRenamed("id", "n")
    with pytest.raises(ValueError, match="refusing"):
        write_excel_bridge(df, "/tmp/never_written.xlsx", max_rows=10)


def test_excel_bridge_absolute_rel_target(spark, tmp_path):
    # Some writers emit spec-legal ABSOLUTE targets ("/xl/worksheets/...");
    # the bridge must resolve them archive-root-relative, not double the
    # xl/ prefix.
    p = tmp_path / "abs_target.xlsx"
    abs_rels = _RELS.replace(
        'Target="worksheets/sheet1.xml"', 'Target="/xl/worksheets/sheet1.xml"'
    ).replace('Target="worksheets/sheet2.xml"', 'Target="/xl/worksheets/sheet2.xml"')
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("[Content_Types].xml", _TYPES)
        zf.writestr("xl/workbook.xml", _WB)
        zf.writestr("xl/_rels/workbook.xml.rels", abs_rels)
        zf.writestr("xl/sharedStrings.xml", _SST)
        zf.writestr("xl/worksheets/sheet1.xml", _SHEET1)
        zf.writestr("xl/worksheets/sheet2.xml", _SHEET2)
    df = read_excel_bridge(spark, str(p), sheet_name="input", header_row=4)
    assert df.columns == ["Permit #", "Status", "Count"]
    assert df.count() == 2

    # An absolute target may also point OUTSIDE xl/ (part at archive
    # root) — it must resolve archive-root-relative, with no xl/ prefix.
    p2 = tmp_path / "root_part.xlsx"
    root_rels = _RELS.replace(
        'Target="worksheets/sheet2.xml"', 'Target="/custom/sheet2.xml"'
    )
    with zipfile.ZipFile(p2, "w") as zf:
        zf.writestr("[Content_Types].xml", _TYPES)
        zf.writestr("xl/workbook.xml", _WB)
        zf.writestr("xl/_rels/workbook.xml.rels", root_rels)
        zf.writestr("xl/sharedStrings.xml", _SST)
        zf.writestr("xl/worksheets/sheet1.xml", _SHEET1)
        zf.writestr("custom/sheet2.xml", _SHEET2)
    df2 = read_excel_bridge(spark, str(p2), sheet_name="input", header_row=4)
    assert df2.columns == ["Permit #", "Status", "Count"]
    assert df2.count() == 2


def test_excel_write_mixed_numeric_lexical_contract(spark, tmp_path):
    # The documented numeric round-trip contract: every cell comes back a
    # STRING holding the lexical <v> text — Python str() forms for our own
    # writer — and non-finite floats are written as EMPTY cells (NaN is not
    # a legal OOXML numeric value), surfacing as null like None.
    df = spark.createDataFrame(
        [
            (1, 2.5, float("nan"), "001"),
            (9007199254740993, 1e20, float("inf"), ""),
            (-3, 1e-07, 0.5, "x"),
        ],
        ["big", "flt", "weird", "txt"],
    )
    p = str(tmp_path / "mixed.xlsx")
    assert write_excel_bridge(df, p) == 3
    back = read_excel_bridge(spark, p)
    assert all(t == "string" for _, t in back.dtypes)
    rows = sorted(tuple(r) for r in back.collect())
    assert rows == sorted(
        [
            ("1", "2.5", None, "001"),  # NaN -> empty cell -> null
            ("9007199254740993", "1e+20", None, ""),  # int exact past 2^53
            ("-3", "1e-07", "0.5", "x"),
        ]
    )


def test_excel_bridge_rejects_garbage_cleanly(tmp_path):
    """A corrupt upload — random bytes, or a real zip wrapping garbage
    XML / missing parts — must raise ValueError from the xlsx reader
    (the typed reject the ingest quarantine depends on), never leak
    BadZipFile / ParseError / KeyError internals."""
    import io
    import random
    import zipfile

    import pytest

    from pmp_analytics_spark.sources.bridges import _xlsx_rows

    rng = random.Random(3)
    cases = [bytes(rng.randrange(256) for _ in range(rng.randrange(0, 400))) for _ in range(40)]
    for i in range(12):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("xl/workbook.xml", bytes(rng.randrange(256) for _ in range(40)))
            if i % 2:
                z.writestr("xl/worksheets/sheet1.xml", b"<not xml")
        cases.append(buf.getvalue())
    for i, payload in enumerate(cases):
        p = str(tmp_path / f"f{i}.xlsx")
        with open(p, "wb") as f:
            f.write(payload)
        with pytest.raises(ValueError):
            _xlsx_rows(p, None)
