"""Pure-stdlib XLSX reader/writer (io/xlsx.py) and its wiring into
read_excel / export_rows — the path openpyxl used to gate."""

import zipfile

import pytest

from packs_spark.io.xlsx import read_xlsx, write_xlsx


def test_xlsx_roundtrip(tmp_path):
    p = str(tmp_path / "t.xlsx")
    write_xlsx(
        p,
        ["name", "score", "active"],
        [["alice", 1.5, True], ["bob", 2.0, False], [None, None, None]],
    )
    header, rows = read_xlsx(p)
    assert header == ["name", "score", "active"]
    assert rows == [
        ["alice", 1.5, True],
        ["bob", 2.0, False],
        [None, None, None],
    ]


def test_xlsx_escapes_markup_and_preserves_space(tmp_path):
    p = str(tmp_path / "esc.xlsx")
    write_xlsx(p, ["v"], [["<b>&'\"</b>"], ["  padded  "]])
    _, rows = read_xlsx(p)
    assert rows == [["<b>&'\"</b>"], ["  padded  "]]


def test_xlsx_skiprows(tmp_path):
    p = str(tmp_path / "s.xlsx")
    write_xlsx(p, ["junk"], [["also junk"], ["name"], ["alice"]])
    header, rows = read_xlsx(p, skiprows=2)
    assert header == ["name"]
    assert rows == [["alice"]]


def test_xlsx_shared_strings_and_sparse_cells(tmp_path):
    """Hand-built workbook using sharedStrings + a gap cell (C without B)
    — the shapes other producers emit that the writer itself does not."""
    p = str(tmp_path / "ss.xlsx")
    sheet = (
        '<?xml version="1.0"?><worksheet xmlns="http://schemas.'
        'openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c>'
        '<c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>'
        '<row r="2"><c r="A2" t="s"><v>3</v></c><c r="C2"><v>9</v></c></row>'
        "</sheetData></worksheet>"
    )
    shared = (
        '<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.'
        'org/spreadsheetml/2006/main"><si><t>a</t></si><si><t>b</t></si>'
        "<si><t>c</t></si><si><t>x</t></si></sst>"
    )
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)
        z.writestr("xl/sharedStrings.xml", shared)
    header, rows = read_xlsx(p)
    assert header == ["a", "b", "c"]
    assert rows == [["x", None, 9.0]]


def test_xlsx_phonetic_runs_and_sparse_rows(tmp_path):
    """Two producer shapes pandas/openpyxl honor: <rPh> phonetic (furigana)
    runs inside shared strings must NOT leak into cell values, and omitted
    empty rows (sparse sheetData) must keep their row indices instead of
    shifting later rows up."""
    p = str(tmp_path / "ph.xlsx")
    sheet = (
        '<?xml version="1.0"?><worksheet xmlns="http://schemas.'
        'openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c></row>'
        # row 2 omitted entirely; row 3 carries the value
        '<row r="3"><c r="A3" t="s"><v>1</v></c></row>'
        '<row r="4"><c r="A4" t="inlineStr"><is><r><t>in</t></r>'
        "<rPh><t>ruby2</t></rPh><r><t>line</t></r></is></c></row>"
        "</sheetData></worksheet>"
    )
    shared = (
        '<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.'
        'org/spreadsheetml/2006/main">'
        "<si><t>name</t></si>"
        # rich-text si: two runs + a phonetic block that must be skipped
        "<si><r><t>東</t></r><rPh><t>とう</t></rPh><r><t>京</t></r></si>"
        "</sst>"
    )
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)
        z.writestr("xl/sharedStrings.xml", shared)
    header, rows = read_xlsx(p)
    assert header == ["name"]
    # the omitted row 2 survives as a blank (all-None) row, not a shift-up
    assert rows == [[None], ["東京"], ["inline"]]


def test_read_excel_spark_end_to_end(spark, tmp_path):
    from packs_spark.io.sources import read_excel

    p = str(tmp_path / "src.xlsx")
    write_xlsx(
        p,
        ["name", "age", "ok"],
        [["alice", 30.0, True], ["bob", 41.0, False], ["carol", None, True]],
    )
    df = read_excel(spark, p)
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "string", "double", "boolean",
    ]
    got = {r["name"]: (r["age"], r["ok"]) for r in df.collect()}
    assert got == {"alice": (30.0, True), "bob": (41.0, False),
                   "carol": (None, True)}


def test_export_rows_xlsx(spark, tmp_path):
    from packs_spark.io.export import export_rows

    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "k string, v double"
    )
    p = str(tmp_path / "out.xlsx")
    export_rows(df.orderBy("k"), p, fmt="xlsx")
    header, rows = read_xlsx(p)
    assert header == ["k", "v"]
    assert sorted(rows) == [["a", 1.0], ["b", 2.0]]


def test_excel_source_through_pack(spark, tmp_path):
    """S1 closed: a pack run over an .xlsx source executes in this
    environment (was NotImplementedError without openpyxl)."""
    from packs_spark.pack_api import run_pack

    p = str(tmp_path / "people.xlsx")
    write_xlsx(
        p,
        ["name", "comment"],
        [["alice", "fine"], ["bob", "n/a"], ["carol", "fine"]],
    )
    out = run_pack(
        spark,
        "text_validation",
        {"type": "excel", "path": p, "name": "people"},
        {"job": {"columns": ["comment"]}},
    )
    m = {(r.key, r.scope): r.value for r in out["metrics"].collect()}
    assert m[("non_null", "comment")] == "3"
    assert m[("null_placeholder_text_found", "comment")] == "1"


def test_export_rows_xlsx_array_column(spark, tmp_path):
    """Regression (ADVICE r3): Arrow-enabled toPandas() hands ArrayType
    cells to the xlsx fallback as numpy arrays; the NaN guard must not
    call pd.isna on them (ambiguous-truth crash).  Arrays export as their
    string form; scalar NaNs still become empty cells."""
    from packs_spark.io.export import export_rows

    df = spark.createDataFrame(
        [("a", [1.0, 2.0], 1.5), ("b", [], None)],
        "k string, vec array<double>, x double",
    )
    p = str(tmp_path / "arr.xlsx")
    export_rows(df.orderBy("k"), p, fmt="xlsx")
    header, rows = read_xlsx(p)
    assert header == ["k", "vec", "x"]
    assert rows[0][0] == "a" and "1" in rows[0][1] and rows[0][2] == 1.5
    assert rows[1][2] is None


def test_xlsx_blank_first_row_and_bottom_stray_cell(tmp_path):
    """Two review findings: a sheet whose first row is omitted (header at
    r=2) must still yield the header, not empty-header total data loss;
    and one stray formatted cell at the sheet bottom (r=1048576) must not
    materialize a million placeholder rows."""
    p = str(tmp_path / "gap.xlsx")
    sheet = (
        '<?xml version="1.0"?><worksheet xmlns="http://schemas.'
        'openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        '<row r="2"><c r="A2" t="inlineStr"><is><t>name</t></is></c></row>'
        '<row r="3"><c r="A3" t="inlineStr"><is><t>alice</t></is></c></row>'
        '<row r="1048576"><c r="A1048576" t="inlineStr">'
        "<is><t>stray</t></is></c></row>"
        "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    header, rows = read_xlsx(p)
    assert header == ["name"]
    assert rows[0] == ["alice"]
    # gap budget: placeholder rows are capped, the stray row survives
    assert len(rows) < 20_000
    assert rows[-1] == ["stray"]


def test_duplicate_row_indices_overwrite_like_openpyxl(tmp_path):
    """Malformed sheets mixing r-less rows with colliding explicit r: the
    r-less row takes the next index and a later duplicate r overwrites it
    (openpyxl parity -- cells land at the same coordinates, last write
    wins).  Documented semantics, not data-loss-by-accident."""
    p = str(tmp_path / "dup.xlsx")
    sheet = (
        '<?xml version="1.0"?><worksheet xmlns="http://schemas.'
        'openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c r="A1" t="inlineStr"><is><t>h</t></is></c></row>'
        '<row r="2"><c r="A2" t="inlineStr"><is><t>A</t></is></c></row>'
        # r-less row: takes the next index (3)
        '<row><c t="inlineStr"><is><t>B</t></is></c></row>'
        # explicit r=3 collides with it and wins
        '<row r="3"><c r="A3" t="inlineStr"><is><t>C</t></is></c></row>'
        "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    header, rows = read_xlsx(p)
    assert header == ["h"]
    assert rows == [["A"], ["C"]]
