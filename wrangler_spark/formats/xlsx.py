"""Minimal XLSX (ECMA-376 SpreadsheetML) sheet reader — stdlib only.

XLSX is a zip: xl/workbook.xml lists sheets, xl/sharedStrings.xml holds
the shared-string table, xl/worksheets/sheetN.xml holds rows of cells with
A1-style references. Covers inline/shared strings, numbers and booleans —
the surface the reference's POI-based parse-as-excel exercises.
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
_CELL_RE = re.compile(r"([A-Z]+)(\d+)")


def col_letter_to_index(letters: str) -> int:
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def sheet_exists(payload: bytes, sheet: str | int = 0) -> bool:
    """Cheap readability probe: open the zip, resolve the sheet from
    workbook.xml, and XML-parse the worksheet entry — but skip the
    shared-string table and all cell extraction (the bulk of read_sheet's
    work). For the error-channel routing predicate that runs over EVERY
    payload; read_sheet's remaining failure modes past this probe
    (e.g. an out-of-range shared-string index) are guarded at the caller."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        sheets = [(s.get("name"), i + 1) for i, s in enumerate(wb.find("m:sheets", _NS) or [])]
        if isinstance(sheet, int) or (isinstance(sheet, str) and sheet.isdigit()):
            target = int(sheet) + 1
        else:
            target = next((idx for name, idx in sheets if name == sheet), None)
            if target is None:
                return False
        sheet_path = f"xl/worksheets/sheet{target}.xml"
        if sheet_path not in zf.namelist():
            return False
        ET.fromstring(zf.read(sheet_path))
        return True
    except Exception:  # noqa: BLE001 — any malformed container is unreadable
        return False


def read_sheet(payload: bytes, sheet: str | int = 0) -> list[dict[str, str]]:
    """Returns one dict per non-empty row: {column-letter: value-as-string}."""
    zf = zipfile.ZipFile(io.BytesIO(payload))

    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in root.findall("m:si", _NS):
            shared.append("".join(t.text or "" for t in si.iter(f"{{{_NS['m']}}}t")))

    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    sheets = [(s.get("name"), i + 1) for i, s in enumerate(wb.find("m:sheets", _NS) or [])]
    if isinstance(sheet, int) or (isinstance(sheet, str) and sheet.isdigit()):
        target = int(sheet) + 1
    else:
        target = next((idx for name, idx in sheets if name == sheet), None)
        if target is None:
            raise ValueError(f"sheet {sheet!r} not found; sheets: {[n for n, _ in sheets]}")

    sheet_path = f"xl/worksheets/sheet{target}.xml"
    root = ET.fromstring(zf.read(sheet_path))
    rows: list[dict[str, str]] = []
    for row in root.iter(f"{{{_NS['m']}}}row"):
        out: dict[str, str] = {}
        for cell in row.findall("m:c", _NS):
            ref = cell.get("r", "")
            m = _CELL_RE.match(ref)
            letter = m.group(1) if m else "A"
            ctype = cell.get("t", "n")
            v = cell.find("m:v", _NS)
            if ctype == "s" and v is not None and v.text is not None:
                val = shared[int(v.text)]
            elif ctype == "inlineStr":
                is_el = cell.find("m:is", _NS)
                val = "".join(t.text or "" for t in is_el.iter(f"{{{_NS['m']}}}t")) if is_el is not None else ""
            elif ctype == "b" and v is not None:
                val = "true" if v.text == "1" else "false"
            else:
                val = v.text if v is not None and v.text is not None else ""
            if val != "":
                out[letter] = val
        if out:
            rows.append(out)
    return rows
