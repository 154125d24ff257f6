"""Dependency-free minimal .xlsx codec (read + write).

The reference reads condition workbooks with openpyxl
(/root/reference/tsa/analysis_collection.py:67-110) and writes result
workbooks with it (:195-231). openpyxl is not available in this container,
and xlsx is just a zip of XML parts — so this module implements the small
subset the engine needs, from the public ECMA-376 (OOXML) spreadsheet
format:

- read: sheet names + cell grids (shared strings, inline strings, numbers,
  booleans; date-styled serial numbers are converted to datetime using the
  built-in date numFmt ids 14-22 — the 1900 date system);
- write: multiple sheets of python values (str/int/float/bool/datetime/
  None), with an optional per-column number format — enough for the
  reference's summary workbook including its ``0.00 %`` percentage cells.

Everything is driver-side: workbooks are condition sheets and one-row-per-
condition summaries (10¹-10³ cells), never data-scale artifacts.
"""

from __future__ import annotations

import re
import zipfile
from datetime import datetime, timedelta
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = {
    "m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main",
    "r": "http://schemas.openxmlformats.org/officeDocument/2006/relationships",
    "ct": "http://schemas.openxmlformats.org/package/2006/content-types",
    "rel": "http://schemas.openxmlformats.org/package/2006/relationships",
}

#: OOXML built-in numFmtIds that render as dates/times (ECMA-376 §18.8.30).
_DATE_NUMFMT_IDS = set(range(14, 23)) | {45, 46, 47}

#: Excel 1900 date system epoch (serial 1 = 1900-01-01, with the historical
#: leap-year bug making serial 60 a phantom Feb 29 — handled below).
_EPOCH_1900 = datetime(1899, 12, 30)


def _col_to_idx(ref: str) -> int:
    """'A' -> 0, 'AB' -> 27 (cell reference column letters)."""
    n = 0
    for ch in ref:
        if ch.isdigit():
            break
        n = n * 26 + (ord(ch.upper()) - 64)
    return n - 1


def _idx_to_col(i: int) -> str:
    s = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        s = chr(65 + r) + s
    return s


def _is_date_format(code: str) -> bool:
    """True if a numFmt formatCode renders as a date/time.

    Probes for date letters AFTER stripping [bracket] sections and
    "quoted literal" text — ElementTree has already unescaped entities, so
    quoted literals arrive as plain ``"..."``; without stripping them a
    numeric format like ``0.0" m"`` or ``#,##0 "days"`` would be
    misclassified as a date."""
    return bool(re.search(r"[dmyhs]", re.sub(r'\[[^\]]*\]|"[^"]*"', "", code), re.I))


def _serial_to_datetime(serial: float) -> datetime:
    # Excel's 1900 system counts a nonexistent 1900-02-29 (serial 60);
    # serials >= 61 are therefore offset by one extra day in _EPOCH_1900.
    if serial < 60:
        return _EPOCH_1900 + timedelta(days=serial + 1)
    return _EPOCH_1900 + timedelta(days=serial)


def _datetime_to_serial(dt: datetime) -> float:
    delta = dt - _EPOCH_1900
    # total_seconds, not delta.seconds: .seconds is the within-day remainder
    # and mishandles pre-epoch datetimes (negative deltas).
    serial = delta.total_seconds() / 86400.0
    # Serial 60 is Excel's phantom 1900-02-29; real dates <= 1900-02-28 map
    # one lower (1900-02-28 -> 59), only 1900-03-01+ (>= 61) keep the raw
    # offset.
    return serial if serial >= 61 else serial - 1


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------


def read_xlsx(path: str) -> dict[str, list[list]]:
    """Workbook → {sheet_name: grid of python values}, sheet order kept.

    Supports the cell types the reference's workbooks use: shared strings
    (t="s"), inline strings (t="inlineStr"), formula-cached strings
    (t="str"), booleans (t="b"), and numbers — numbers whose cell style is a
    built-in date format come back as datetime."""
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rid_to_target = {
            rel.get("Id"): rel.get("Target").lstrip("/")
            for rel in rels.findall("rel:Relationship", _NS)
        }
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in sst.findall("m:si", _NS):
                shared.append("".join(t.text or "" for t in si.iter(f"{{{_NS['m']}}}t")))
        date_styles: set[int] = set()
        if "xl/styles.xml" in z.namelist():
            styles = ET.fromstring(z.read("xl/styles.xml"))
            # custom numFmts that look like dates, plus built-in date ids
            custom_date_ids = {
                int(nf.get("numFmtId"))
                for nfs in styles.findall("m:numFmts", _NS)
                for nf in nfs.findall("m:numFmt", _NS)
                if _is_date_format(nf.get("formatCode", ""))
            }
            cell_xfs = styles.find("m:cellXfs", _NS)
            if cell_xfs is not None:
                for i, xf in enumerate(cell_xfs.findall("m:xf", _NS)):
                    fmt = int(xf.get("numFmtId", "0"))
                    if fmt in _DATE_NUMFMT_IDS or fmt in custom_date_ids:
                        date_styles.add(i)

        out: dict[str, list[list]] = {}
        for sheet in wb.find("m:sheets", _NS).findall("m:sheet", _NS):
            name = sheet.get("name")
            target = rid_to_target[sheet.get(f"{{{_NS['r']}}}id")]
            if not target.startswith("xl/"):
                target = "xl/" + target
            ws = ET.fromstring(z.read(target))
            grid: list[list] = []
            for row in ws.find("m:sheetData", _NS).findall("m:row", _NS):
                r_idx = int(row.get("r", len(grid) + 1)) - 1
                while len(grid) <= r_idx:
                    grid.append([])
                cells = grid[r_idx]
                for c in row.findall("m:c", _NS):
                    c_idx = _col_to_idx(c.get("r", ""))
                    if c_idx < 0:
                        c_idx = len(cells)
                    while len(cells) <= c_idx:
                        cells.append(None)
                    cells[c_idx] = _cell_value(c, shared, date_styles)
            out[name] = grid
        return out


def _cell_value(c, shared: list[str], date_styles: set[int]):
    t = c.get("t", "n")
    v = c.find("m:v", _NS)
    if t == "inlineStr":
        is_el = c.find("m:is", _NS)
        if is_el is None:
            return None
        return "".join(el.text or "" for el in is_el.iter(f"{{{_NS['m']}}}t"))
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "str":
        return v.text
    if t == "b":
        return v.text == "1"
    num = float(v.text)
    if int(c.get("s", "-1")) in date_styles:
        return _serial_to_datetime(num)
    return int(num) if num == int(num) and "e" not in v.text.lower() and "." not in v.text else num


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
{sheet_overrides}
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

#: Styles: xf 0 = default; xf 1 = custom numFmt 164 ("0.00 %" — the exact
#: format string the reference sets on percentage columns,
#: analysis_collection.py:225-228); xf 2 = built-in 22 (date+time).
_STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<numFmts count="1"><numFmt numFmtId="164" formatCode="0.00&quot; %&quot;"/></numFmts>
<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>
<fills count="1"><fill><patternFill patternType="none"/></fill></fills>
<borders count="1"><border/></borders>
<cellStyleXfs count="1"><xf numFmtId="0" fontId="0" fillId="0" borderId="0"/></cellStyleXfs>
<cellXfs count="3">
<xf numFmtId="0" fontId="0" fillId="0" borderId="0" xfId="0"/>
<xf numFmtId="164" fontId="0" fillId="0" borderId="0" xfId="0" applyNumberFormat="1"/>
<xf numFmtId="22" fontId="0" fillId="0" borderId="0" xfId="0" applyNumberFormat="1"/>
</cellXfs>
</styleSheet>"""

#: Style indices usable in ``column_styles``.
STYLE_DEFAULT = 0
STYLE_PERCENT = 1  # "0.00 %" (numFmt 164)
STYLE_DATETIME = 2  # built-in 22: m/d/yy h:mm


def write_xlsx(
    path: str,
    sheets: dict[str, list[list]],
    *,
    column_styles: dict[str, dict[int, int]] | None = None,
) -> str:
    """Write {sheet_name: grid} to ``path``.

    ``column_styles``: per sheet, {column_index: style_index} applied to all
    rows after the first (header) row — STYLE_PERCENT gives the reference's
    ``0.00 %`` cells. Values: str → inline string; bool → b; int/float → n;
    datetime → date-styled serial; None → skipped."""
    column_styles = column_styles or {}
    names = list(sheets)
    sheet_overrides = "\n".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        for i in range(len(names))
    )
    wb_sheets = "".join(
        f'<sheet name="{escape(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(names)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{wb_sheets}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + f'<Relationship Id="rId{len(names) + 1}" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" '
        'Target="styles.xml"/>'
        "</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES.format(sheet_overrides=sheet_overrides))
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/styles.xml", _STYLES)
        for i, n in enumerate(names):
            z.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                _sheet_xml(sheets[n], column_styles.get(n, {})),
            )
    return path


def _sheet_xml(grid: list[list], col_styles: dict[int, int]) -> str:
    rows_xml = []
    for ri, row in enumerate(grid):
        cells = []
        for ci, val in enumerate(row):
            if val is None:
                continue
            ref = f"{_idx_to_col(ci)}{ri + 1}"
            style = col_styles.get(ci, 0) if ri > 0 else 0
            if isinstance(val, bool):
                cells.append(f'<c r="{ref}" t="b" s="{style}"><v>{int(val)}</v></c>')
            elif isinstance(val, datetime):
                s = style or STYLE_DATETIME
                cells.append(f'<c r="{ref}" s="{s}"><v>{_datetime_to_serial(val)!r}</v></c>')
            elif isinstance(val, (int, float)):
                cells.append(f'<c r="{ref}" s="{style}"><v>{val!r}</v></c>')
            else:
                cells.append(
                    f'<c r="{ref}" t="inlineStr" s="{style}"><is><t xml:space="preserve">'
                    f"{escape(str(val))}</t></is></c>"
                )
        rows_xml.append(f'<row r="{ri + 1}">{"".join(cells)}</row>')
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f'<sheetData>{"".join(rows_xml)}</sheetData></worksheet>'
    )
