"""K4: Google-Sheets append semantics, transport-injectable.

The reference appends result rows to tracking spreadsheets by reading
column A to find the last used row, then writing an A1-notation range
directly below it with RAW values (threshold.py:87-100,
unreg_pharmacists.py:163-208). Everything EXCEPT the HTTPS hop is
engine-testable logic: the bounded collect, cell serialization to what
the Sheets values API accepts, the last-row probe, and the A1 range
arithmetic. This module implements exactly that and takes the transport
(two callables) as an argument — the googleapiclient binding is
import-gated, and any deployment can hand in its own authenticated
transport.

Scale posture: a spreadsheet sink is a human-report surface, so the
collect is capped the same way as the Excel and clipboard sinks — this
is a presentation egress for aggregated results, never a data path.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class SheetsTransport:
    """The two Sheets-API calls the append needs. ``get_values`` returns
    the rows currently in a range (list of lists); ``update_values``
    writes ``values`` into ``range`` with RAW input semantics."""

    get_values: Callable[[str, str], list[list]]
    update_values: Callable[[str, str, list[list]], None]


def _col_letter(n: int) -> str:
    """1-indexed column number → A1 letter (27 → AA)."""
    out = ""
    while n > 0:
        n, r = divmod(n - 1, 26)
        out = chr(ord("A") + r) + out
    return out


def _cell(v):
    if v is None:
        return ""
    if isinstance(v, bool | int | float | str):
        return v
    if isinstance(v, _dt.datetime | _dt.date):
        return v.isoformat()
    return str(v)


def sheet_append(
    df: DataFrame,
    spreadsheet_id: str,
    sheet_name: str,
    transport: SheetsTransport,
    max_rows: int = 10_000,
) -> str:
    """Append ``df``'s rows below the sheet's last used row (probed via
    column A, the reference's method — including its quirk that an EMPTY
    sheet probes as last_row=1, so the first append starts at row 2,
    threshold.py:92). Returns the A1 range written."""
    head = df.limit(max_rows + 1).collect()  # one job, one snapshot
    if len(head) > max_rows:
        raise ValueError(
            f"sheet_append is for small outputs: got >{max_rows} rows; "
            "aggregate or raise max_rows deliberately"
        )
    rows = [[_cell(v) for v in r] for r in head]
    if not rows:
        return f"{sheet_name}!A1:A0"

    existing = transport.get_values(spreadsheet_id, f"{sheet_name}!A:A")
    last_row = len(existing) if existing else 1
    width = _col_letter(len(df.columns))
    rng = f"{sheet_name}!A{last_row + 1}:{width}{last_row + len(rows)}"
    transport.update_values(spreadsheet_id, rng, rows)
    return rng


def googleapi_transport(creds) -> SheetsTransport:  # pragma: no cover
    """Bind the transport to googleapiclient (absent in this container)."""
    try:
        from googleapiclient.discovery import build
    except ImportError as exc:
        raise NotImplementedError(
            "googleapi_transport needs google-api-python-client (not "
            "installed); inject your own SheetsTransport instead"
        ) from exc
    service = build("sheets", "v4", credentials=creds)
    values = service.spreadsheets().values()
    return SheetsTransport(
        get_values=lambda sid, rng: values.get(spreadsheetId=sid, range=rng)
        .execute()
        .get("values", []),
        update_values=lambda sid, rng, data: values.update(
            spreadsheetId=sid,
            range=rng,
            valueInputOption="RAW",
            body={"values": data},
        ).execute(),
    )
