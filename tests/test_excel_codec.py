"""xlsx codec invariants: cell-ref alignment with skipped cells, shared
vs inline strings, bool/number types, column-letter arithmetic, and a
cross-check that the archive is a well-formed OOXML package.
"""

from __future__ import annotations

from apache_nifi_spark.sources.excel_codec import (
    col_letter,
    parse_xlsx,
    xlsx_bytes,
)


def test_col_letter_arithmetic():
    assert [col_letter(i) for i in (0, 1, 25, 26, 27, 51, 52, 701, 702)] == [
        "A", "B", "Z", "AA", "AB", "AZ", "BA", "ZZ", "AAA",
    ]


def test_roundtrip_types_and_nulls():
    headers = ["id", "name", "score", "ok"]
    rows = [
        (1, "alpha", 3.25, True),
        (2, None, -1.5, False),      # skipped cell → None in that column
        (3, "needs <escaping> & stuff", None, None),
    ]
    h, back = parse_xlsx(xlsx_bytes(headers, rows))
    assert h == headers
    assert back[0] == [1.0, "alpha", 3.25, True]
    assert back[1] == [2.0, None, -1.5, False]
    assert back[2] == [3.0, "needs <escaping> & stuff", None, None]


def test_shared_strings_deduplicate():
    import zipfile, io

    data = xlsx_bytes(["a", "b"], [("x", "x"), ("x", "y")])
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        sst = z.read("xl/sharedStrings.xml").decode()
        # 'x' appears three times in cells but once in the table
        assert sst.count("<si><t>x</t></si>") == 1
        # package shape: every mandatory OOXML part present
        names = set(z.namelist())
        assert {"[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
                "xl/_rels/workbook.xml.rels", "xl/worksheets/sheet1.xml",
                "xl/sharedStrings.xml"} <= names


def test_inline_string_cells_parse():
    # A workbook some OTHER writer produced may use inlineStr cells —
    # build one by hand and make sure the parser resolves it.
    import io, zipfile

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (
        f'<worksheet xmlns="{ns}"><sheetData>'
        '<row r="1"><c r="A1" t="inlineStr"><is><t>hdr</t></is></c></row>'
        '<row r="2"><c r="A2" t="inlineStr"><is><t>val</t></is></c></row>'
        "</sheetData></worksheet>"
    )
    base = xlsx_bytes(["x"], [(1,)])
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(base)) as zin, zipfile.ZipFile(buf, "w") as zout:
        for n in zin.namelist():
            if n == "xl/worksheets/sheet1.xml":
                zout.writestr(n, sheet)
            else:
                zout.writestr(n, zin.read(n))
    h, rows = parse_xlsx(buf.getvalue())
    assert h == ["hdr"] and rows == [["val"]]


def test_spark_group_roundtrip(spark):
    from pyspark.sql import functions as F

    from apache_nifi_spark.sources.excel_codec import (
        excel_to_records,
        records_to_excel,
    )

    df = spark.createDataFrame(
        [(i, f"n{i}", float(i) * 1.1, "g" + str(i % 3)) for i in range(30)],
        "id long, name string, v double, g string",
    )
    books = records_to_excel(df, "g", ["id", "name", "v", "g"])
    assert books.count() == 3
    back = excel_to_records(
        books.select("workbook"), "workbook", "id double, name string, v double, g string"
    )
    got = {
        (int(r["id"]), r["name"], r["v"], r["g"]) for r in back.collect()
    }
    want = {(i, f"n{i}", i * 1.1, "g" + str(i % 3)) for i in range(30)}
    assert got == want
