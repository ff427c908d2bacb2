"""Driver-side ingestion bridges for operational spreadsheet files
(SURVEY §2.1 S4/S5).

The reference ingests two "desk file" shapes Spark has no native reader
for:

- Excel workbooks with a header offset and NO schema inference —
  ``lazyframe_from_id_and_sheetname(..., infer_schema_length=0,
  read_options={'header_row': 4})``
  (/root/reference/permit_inspection_licenses.py:19; also
  /root/reference/mm1.py:30, /root/reference/mu_extras.py:108), and
- ``.xls`` exports that are really HTML tables —
  ``pd.read_html(t_fp, header=1)[0]`` (/root/reference/techs.py:18,31).

These are small operator-maintained files (inspection trackers, license
exports), not datasets: the right engine shape is parse ON THE DRIVER →
``createDataFrame`` with an ALL-STRING schema (the reference's
``infer_schema_length=0`` contract — typing happens downstream with
explicit casts, same as the CSV path), not a distributed source. Both
parsers are stdlib-only (xlsx is public Office Open XML — a zip of
XML parts; HTML tables via ``html.parser``) because this container
ships no Excel/HTML engine; the formats are public specs, and the
bridge stays importable anywhere.
"""

from __future__ import annotations

import math
import re
import zipfile
from html.parser import HTMLParser
from xml.etree import ElementTree

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_REL = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
)
_NS_PKG = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _col_index(cell_ref: str) -> int:
    """'B7' -> 1 (0-based column from the A1-style reference)."""
    idx = 0
    for ch in cell_ref:
        if ch.isalpha():
            idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return idx - 1


def _xlsx_shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ElementTree.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.iter(f"{_NS}si"):
        # rich-text runs split one string over several <t>; join them
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _xlsx_sheet_part(zf: zipfile.ZipFile, sheet_name: str | None) -> str:
    """Resolve a sheet name to its zip part via workbook + rels (sheet
    order in the zip is NOT the workbook order; the rels indirection is
    the spec'd mapping)."""
    wb = ElementTree.fromstring(zf.read("xl/workbook.xml"))
    rels = ElementTree.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    target_by_rid = {
        rel.get("Id"): rel.get("Target") for rel in rels.iter(f"{_NS_PKG}Relationship")
    }
    sheets = [
        (s.get("name"), target_by_rid[s.get(f"{_NS_REL}id")])
        for s in wb.iter(f"{_NS}sheet")
    ]
    if not sheets:
        raise ValueError("workbook has no sheets")
    if sheet_name is None:
        target = sheets[0][1]
    else:
        matches = [t for n, t in sheets if n == sheet_name]
        if not matches:
            raise ValueError(
                f"sheet {sheet_name!r} not found; workbook has "
                f"{[n for n, _ in sheets]}"
            )
        target = matches[0]
    # OPC target resolution: an ABSOLUTE target ("/xl/worksheets/..." or
    # "/worksheets/..." — emitted by some writers) is already
    # archive-root-relative and must NOT get the xl/ prefix; a relative
    # target resolves against the workbook part's directory (xl/).
    if target.startswith("/"):
        return target.lstrip("/")
    return target if target.startswith("xl/") else f"xl/{target}"


def _xlsx_rows(path: str, sheet_name: str | None) -> list[list[str | None]]:
    try:
        with zipfile.ZipFile(path) as zf:
            shared = _xlsx_shared_strings(zf)
            sheet_xml = zf.read(_xlsx_sheet_part(zf, sheet_name))
        return _xlsx_rows_from_xml(sheet_xml, shared)
    except ValueError:
        raise
    except (
        zipfile.BadZipFile,
        KeyError,
        IndexError,
        ElementTree.ParseError,
        OSError,
    ) as e:
        # typed reject: a corrupt upload must quarantine, not leak
        # zip/XML internals to the caller
        raise ValueError(f"not a readable xlsx: {path}: {e}") from e


def _xlsx_rows_from_xml(sheet_xml, shared) -> list[list[str | None]]:
    rows: list[list[str | None]] = []
    for row in ElementTree.fromstring(sheet_xml).iter(f"{_NS}row"):
        cells: list[str | None] = []
        for c in row.iter(f"{_NS}c"):
            idx = _col_index(c.get("r", ""))
            if idx < 0:  # no ref attr: append position (writer-optional)
                idx = len(cells)
            while len(cells) <= idx:  # sparse rows skip empty cells
                cells.append(None)
            ctype = c.get("t", "n")
            if ctype == "inlineStr":
                val = "".join(t.text or "" for t in c.iter(f"{_NS}t"))
            else:
                v = c.find(f"{_NS}v")
                val = None if v is None else (v.text or "")
                if val is not None and ctype == "s":
                    val = shared[int(val)]
            cells[idx] = val
        rows.append(cells)
    return rows


class _TableParser(HTMLParser):
    """Minimal table extractor: every <table> becomes a list of rows;
    <th>/<td> text is concatenated; colspan repeats the value the way
    pandas.read_html does."""

    def __init__(self) -> None:
        super().__init__()
        self.tables: list[list[list[str | None]]] = []
        self._row: list[str | None] | None = None
        self._cell: list[str] | None = None
        self._span = 1

    def handle_starttag(self, tag, attrs):
        if tag == "table":
            self.tables.append([])
        elif tag == "tr" and self.tables:
            self._row = []
        elif tag in ("td", "th") and self._row is not None:
            self._cell = []
            self._span = max(1, int(dict(attrs).get("colspan") or 1))

    def handle_endtag(self, tag):
        if tag in ("td", "th") and self._cell is not None and self._row is not None:
            text = re.sub(r"\s+", " ", "".join(self._cell)).strip()
            self._row.extend([text or None] * self._span)
            self._cell = None
        elif tag == "tr" and self._row is not None:
            self.tables[-1].append(self._row)
            self._row = None

    def handle_data(self, data):
        if self._cell is not None:
            self._cell.append(data)


def _frame_from_rows(
    spark: SparkSession, rows: list[list[str | None]], header_row: int
) -> DataFrame:
    """Rows above ``header_row`` are discarded, the header row names the
    columns (empty header cells get positional ``_cN`` names), and every
    value stays a string — the reference's infer_schema_length=0
    contract. Data rows are padded/truncated to the header width."""
    if header_row >= len(rows):
        raise ValueError(
            f"header_row={header_row} but the table has only {len(rows)} rows"
        )
    header = rows[header_row]
    names = [
        (h.strip() if h and h.strip() else f"_c{i}") for i, h in enumerate(header)
    ]
    width = len(names)
    data = [
        tuple((r[i] if i < len(r) else None) for i in range(width))
        for r in rows[header_row + 1 :]
    ]
    schema = StructType([StructField(n, StringType()) for n in names])
    from pmp_analytics_spark.sources.local import local_df

    return local_df(spark, data, schema)


def _col_letter(idx: int) -> str:
    """0 -> 'A', 27 -> 'AB' (inverse of _col_index)."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


_XLSX_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
 <Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
 <Default Extension="xml" ContentType="application/xml"/>
 <Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
 <Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_XLSX_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_XLSX_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def write_excel_bridge(
    df: DataFrame,
    path: str,
    sheet_name: str = "Sheet1",
    max_rows: int = 100_000,
) -> int:
    """K3: DataFrame → xlsx on the driver, mirroring the reference's
    formatted-report sinks (xlsxwriter in /root/reference/mm2.py:87-127,
    /root/reference/threshold.py:87-100). Returns the number of data
    rows written.

    Presentation files are driver-sized BY DEFINITION (a human opens
    them) — so this collects, with ``max_rows`` as the guard rail
    against someone pointing a 100 TB table at a spreadsheet. Numeric
    columns are written as native Excel numbers, everything else as
    inline strings; cell styling beyond that is presentation concern
    the engine deliberately leaves to downstream tooling. Stdlib-only
    (zip + XML — the same public OOXML the read bridge parses), and
    round-trippable through ``read_excel_bridge``.
    """
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"refusing to write >{max_rows} rows to a spreadsheet; "
            "aggregate or sample first (raise max_rows to override)"
        )
    numeric = {
        name
        for name, dtype in df.dtypes
        if dtype in ("tinyint", "smallint", "int", "bigint", "float", "double")
        or dtype.startswith("decimal")
    }
    lines = ["<sheetData>"]
    header_cells = "".join(
        f'<c r="{_col_letter(i)}1" t="inlineStr"><is><t>{_xml_escape(c)}</t></is></c>'
        for i, c in enumerate(df.columns)
    )
    lines.append(f'<row r="1">{header_cells}</row>')
    for rnum, row in enumerate(rows, start=2):
        cells = []
        for i, name in enumerate(df.columns):
            v = row[name]
            if v is None:
                continue  # sparse like real writers: missing cell = empty
            ref = f"{_col_letter(i)}{rnum}"
            if name in numeric:
                # NaN/Infinity are not valid OOXML numeric cell values —
                # emit an empty (missing) cell, like None.
                if isinstance(v, float) and not math.isfinite(v):
                    continue
                cells.append(f'<c r="{ref}"><v>{v}</v></c>')
            else:
                cells.append(
                    f'<c r="{ref}" t="inlineStr"><is><t>'
                    f"{_xml_escape(str(v))}</t></is></c>"
                )
        lines.append(f'<row r="{rnum}">{"".join(cells)}</row>')
    lines.append("</sheetData>")
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main">' + "".join(lines) + "</worksheet>"
    )
    wb_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
        ' xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships"><sheets>'
        f'<sheet name="{_xml_escape(sheet_name)}" sheetId="1" r:id="rId1"/>'
        "</sheets></workbook>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _XLSX_TYPES)
        zf.writestr("_rels/.rels", _XLSX_ROOT_RELS)
        zf.writestr("xl/workbook.xml", wb_xml)
        zf.writestr("xl/_rels/workbook.xml.rels", _XLSX_WB_RELS)
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml)
    return len(rows)


def read_excel_bridge(
    spark: SparkSession,
    path: str,
    sheet_name: str | None = None,
    header_row: int = 0,
) -> DataFrame:
    """S4: xlsx → all-string DataFrame, mirroring the reference's
    ``read_excel(..., sheet_name=..., infer_schema_length=0,
    read_options={'header_row': N})``
    (/root/reference/permit_inspection_licenses.py:19).

    Numeric-cell contract: like the all-string CSV reader, every cell
    surfaces as a STRING — a numeric cell yields the lexical text of its
    stored ``<v>`` value, NOT a re-formatted number. Round-tripping
    through ``write_excel_bridge`` therefore preserves Python's ``str()``
    form exactly (``5`` → ``"5"``, ``2.5`` → ``"2.5"``, ``1e+20`` →
    ``"1e+20"``); files from other writers yield whatever lexical form
    that writer stored (Excel dates arrive as serial-number strings).
    Casts happen late and explicitly, exactly as with CSV (§2.3 F10
    discipline); non-finite floats were never written (empty cell → null).
    """
    return _frame_from_rows(spark, _xlsx_rows(path, sheet_name), header_row)


def read_html_table_bridge(
    spark: SparkSession,
    path: str,
    table_index: int = 0,
    header_row: int = 0,
) -> DataFrame:
    """S5: HTML table → all-string DataFrame, mirroring the reference's
    ``pd.read_html(t_fp, header=1)[0]`` over .xls-that-are-HTML exports
    (/root/reference/techs.py:18,31)."""
    with open(path, encoding="utf-8", errors="replace") as f:
        parser = _TableParser()
        parser.feed(f.read())
    if table_index >= len(parser.tables):
        raise ValueError(
            f"table_index={table_index} but the document has "
            f"{len(parser.tables)} table(s)"
        )
    return _frame_from_rows(spark, parser.tables[table_index], header_row)
