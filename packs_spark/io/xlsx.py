"""Minimal pure-stdlib XLSX reader/writer (zipfile + ElementTree).

OOXML spreadsheets are ZIP archives of XML parts (ECMA-376); the subset a
data-quality pack needs — one rectangular sheet of strings/numbers/
booleans — is small enough to serve without openpyxl.  The reader
understands shared strings, inline strings, numbers, and booleans, honors
cell references (sparse rows keep their gaps), and supports ``skiprows``;
the writer emits inline-string/number cells on one sheet.  openpyxl, when
installed, is preferred by the callers in io/sources.py and io/export.py
(it covers dates, styles, and multi-sheet workbooks); this module is the
in-environment executable fallback the reference's pandas read_excel path
maps onto.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zipfile
from xml.sax.saxutils import escape

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
_REF_RE = re.compile(r"^([A-Z]+)(\d+)$")

# XML 1.0 valid character ranges — anything else (control chars, lone
# noncharacters like U+FFFF) cannot be represented even escaped, and
# would make the workbook unparseable; the writer replaces them with
# U+FFFD rather than emitting a corrupt file.
_XML_INVALID = re.compile(
    "[^\\x09\\x0a\\x0d\\x20-\\ud7ff\\ue000-\\ufffd\\U00010000-\\U0010ffff]"
)


def _xml_safe(s: str) -> str:
    return _XML_INVALID.sub("�", s)


def _col_index(ref: str) -> int:
    """'A' → 0, 'B' → 1, ..., 'AA' → 26."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _col_name(idx: int) -> str:
    name = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        name = chr(65 + rem) + name
    return name


def _first_sheet_part(z: zipfile.ZipFile) -> str:
    """The part name of the workbook's FIRST sheet in workbook.xml order —
    NOT zip member order, which OOXML leaves unconstrained (an archive may
    store sheet2.xml before sheet1.xml).  Falls back to the lowest
    -numbered worksheet part when workbook metadata is absent."""
    try:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        first = wb.find("m:sheets/m:sheet", _NS)
        rid = first.get(
            "{http://schemas.openxmlformats.org/officeDocument/2006/"
            "relationships}id"
        )
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        for rel in rels:
            if rel.get("Id") == rid:
                target = rel.get("Target").lstrip("/")
                return target if target.startswith("xl/") else f"xl/{target}"
    except (KeyError, AttributeError, ET.ParseError):
        pass
    parts = sorted(
        (int(re.fullmatch(r"xl/worksheets/sheet(\d+)\.xml", n).group(1)), n)
        for n in z.namelist()
        if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
    )
    if not parts:
        raise ValueError("xlsx contains no worksheet parts")
    return parts[0][1]


def _rich_text(el) -> str:
    """Concatenate the text runs of an ``<si>``/``<is>`` element: the bare
    ``t`` child plus each rich run's ``r/t`` — never a blind ``.iter('t')``,
    which would also collect ``<t>`` inside phonetic ``<rPh>`` runs and
    splice furigana ruby text into the cell value."""
    parts = []
    t = el.find("m:t", _NS)
    if t is not None:
        parts.append(t.text or "")
    for run in el.findall("m:r", _NS):
        rt = run.find("m:t", _NS)
        if rt is not None:
            parts.append(rt.text or "")
    return "".join(parts)


def read_xlsx(path: str, skiprows: int = 0) -> tuple[list[str], list[list]]:
    """First worksheet → (header, data_rows).  Cell values come back as
    str / float / bool / None; the first non-skipped row is the header
    (pandas read_excel convention, which the reference packs rely on)."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall("m:si", _NS):
                shared.append(_rich_text(si))
        root = ET.fromstring(z.read(_first_sheet_part(z)))

    # place rows by their 1-based ``r`` attribute (filling omitted rows with
    # empties): generators commonly write sparse sheetData, and pandas/
    # openpyxl honor row indices — document order would shift rows up and
    # break header/skiprows alignment
    placed: dict[int, list] = {}
    next_idx = 0
    for row_el in root.findall(".//m:sheetData/m:row", _NS):
        cells: dict[int, object] = {}
        for i, c in enumerate(row_el.findall("m:c", _NS)):
            ref = c.get("r")
            m = _REF_RE.match(ref) if ref else None
            idx = _col_index(m.group(1)) if m else i
            ctype = c.get("t", "n")
            v = c.find("m:v", _NS)
            if ctype == "s":
                cells[idx] = shared[int(v.text)] if v is not None else None
            elif ctype == "inlineStr":
                is_el = c.find("m:is", _NS)
                cells[idx] = _rich_text(is_el) if is_el is not None else None
            elif ctype == "b":
                cells[idx] = v is not None and v.text == "1"
            elif ctype == "str":
                cells[idx] = v.text if v is not None else None
            else:  # numeric
                cells[idx] = float(v.text) if v is not None else None
        width = max(cells) + 1 if cells else 0
        r_attr = row_el.get("r")
        ridx = int(r_attr) - 1 if r_attr and r_attr.isdigit() else next_idx
        # duplicate indices overwrite (openpyxl parity: cells land at the
        # same coordinates, last write wins) — reachable only from
        # malformed sheets mixing r-less rows with colliding explicit r,
        # or outright duplicate r values
        placed[ridx] = [cells.get(i) for i in range(width)]
        next_idx = ridx + 1

    # Gap filling is budgeted: one stray formatted cell at the sheet
    # bottom (Excel keeps a <row> for any touched cell, r up to 1048576)
    # must not materialize a million placeholder rows.  Interior gaps are
    # preserved up to the budget; beyond it the gap collapses (the row
    # order is still kept).
    _GAP_BUDGET = 10_000
    rows: list[list] = []
    budget = _GAP_BUDGET
    prev = -1
    for ridx in sorted(placed):
        gap = ridx - prev - 1
        fill = min(gap, budget)
        rows.extend([] for _ in range(fill))
        budget -= fill
        rows.append(placed[ridx])
        prev = ridx

    rows = rows[skiprows:]
    # drop leading fully-empty rows before header extraction: a blank
    # first sheet row must not yield an empty header that truncates every
    # data row to zero columns (pandas likewise skips leading blanks).
    # Index scan + one slice: the gap filler above can prepend thousands
    # of empties, and re-slicing per row would be quadratic in them
    first = 0
    while first < len(rows) and not any(v is not None for v in rows[first]):
        first += 1
    rows = rows[first:]
    if not rows:
        return [], []
    header = ["" if h is None else str(h) for h in rows[0]]
    width = len(header)
    data = [r[:width] + [None] * (width - len(r)) for r in rows[1:]]
    return header, data


def write_xlsx(path: str, header: list[str], rows: list[list]) -> str:
    """One-sheet workbook with inline-string / number / boolean cells."""

    import math

    def cell(ref: str, v) -> str:
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, float) and not math.isfinite(v):
            return ""  # <v>nan</v>/<v>inf</v> is not a valid OOXML number
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        # carriage returns must be character references: an XML parser
        # line-ending-normalizes literal \r to \n on read
        text = escape(_xml_safe(str(v)), {"\r": "&#13;"})
        return (
            f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
            f"{text}</t></is></c>"
        )

    def row_xml(rn: int, vals: list) -> str:
        cells = "".join(
            cell(f"{_col_name(i)}{rn}", v) for i, v in enumerate(vals)
        )
        return f'<row r="{rn}">{cells}</row>'

    body = row_xml(1, list(header)) + "".join(
        row_xml(i + 2, r) for i, r in enumerate(rows)
    )
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main">'
        f"<sheetData>{body}</sheetData></worksheet>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships"><sheets>'
        '<sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'worksheet+xml"/></Types>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    return path
