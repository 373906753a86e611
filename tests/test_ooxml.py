"""Native OOXML parse/write round trips (reference semantics:
deepdoc/parser/{docx,excel,ppt}_parser.py)."""

from ragflow_core16_spark.parsers.ooxml import (build_docx, build_pptx,
                                                build_xlsx,
                                                compose_table_grid,
                                                docx_paragraphs, docx_parse,
                                                docx_table_grids,
                                                excel_html, excel_lines,
                                                excel_row_number,
                                                pptx_slides, xlsx_sheets)


# ------------------------------------------------------------------- docx
def test_docx_paragraph_roundtrip_with_styles():
    b = build_docx([("Heading One", "Heading1"), ("Body text.", "Normal"),
                    ("", "Normal")])
    secs = docx_paragraphs(b)
    assert secs == [("Heading One", "Heading1"), ("Body text.", "Normal"),
                    ("", "Normal")]


def test_docx_paragraphs_exclude_table_cells():
    b = build_docx([("para", "Normal")],
                   tables=[[["a", "b"], ["c", "d"]]])
    assert [t for t, _s in docx_paragraphs(b)] == ["para"]
    assert docx_table_grids(b) == [[["a", "b"], ["c", "d"]]]


def test_docx_page_ranges():
    paras = [(f"p{i}", "Normal") for i in range(6)]
    b = build_docx(paras, page_break_every=2)
    # pages: p0,p1 | p2,p3 | p4,p5 — text outside [1,2) blanked, slots kept
    secs = docx_paragraphs(b, from_page=1, to_page=2)
    assert [t for t, _ in secs] == ["", "", "p2", "p3", "", ""]


def test_compose_table_wide_vs_narrow():
    # >3 cols → one line per data row (docx_parser.py:111-114)
    wide = [["h1", "h2", "h3", "h4"], ["a", "b", "c", "d"]]
    assert compose_table_grid(wide) == ["h1: a;h2: b;h3: c;h4: d"]
    # ≤3 cols → all rows collapse into one chunk
    narrow = [["h1", "h2"], ["a", "b"], ["c", "d"]]
    assert compose_table_grid(narrow) == ["h1: a;h2: b\nh1: c;h2: d"]
    assert compose_table_grid([["only header"]]) == []


def test_compose_table_numeric_reanchors_headers():
    # dominant type Nu → a non-numeric row becomes a new header row
    grid = [["Q1", "Q2"], ["1.0", "2.0"], ["metric", "other"],
            ["3.0", "4.0"]]
    lines = compose_table_grid(grid)
    # row 3 should be headed by the re-anchored "metric"/"other" row
    assert any("metric" in ln and "3.0" in ln for ln in lines)


# ------------------------------------------------------------------- xlsx
def test_xlsx_sheet_roundtrip_types():
    b = build_xlsx([("Sheet1", [["name", "n", "f", "b"],
                                ["x", 3, 4.5, True],
                                [None, None, None, None]])])
    [(name, rows)] = xlsx_sheets(b)
    assert name == "Sheet1"
    assert rows[1] == ["x", 3, 4.5, True]
    assert rows[2] == [None, None, None, None]


def test_excel_lines_reference_semantics():
    b = build_xlsx([("Sheet1", [["h1", "h2"], ["a", "b"]]),
                    ("Custom", [["k"], ["v"]])])
    lines = excel_lines(b)
    # fullwidth colon join; non-"Sheet*" sheetname suffix (excel_parser.py:124-126)
    assert lines == ["h1：a; h2：b", "k：v ——Custom"]


def test_excel_html_chunks_and_caption():
    rows = [["h"]] + [[str(i)] for i in range(5)]
    b = build_xlsx([("Sheet1", rows)])
    chunks = excel_html(b, chunk_rows=2)
    assert len(chunks) == 3  # ceil(5/2)
    assert chunks[0].startswith("<table><caption>Sheet1</caption><tr><th>h")
    assert excel_row_number(b) == 6


# ------------------------------------------------------------------- pptx
def test_pptx_slide_order_and_bullets():
    b = build_pptx([
        [{"top": 914400, "left": 0, "paras": [("below", 0, False)]},
         {"top": 0, "left": 0, "paras": [("Title", 0, False)]}],
        [{"top": 0, "left": 0,
          "paras": [("point", 0, True), ("sub", 1, True)]}],
    ])
    slides = pptx_slides(b)
    # shapes sorted by (top//10, left): title first despite source order
    assert slides[0] == "Title\nbelow"
    # bullet rendering: "  "*level + "." + text (ppt_parser.py:26-31)
    assert slides[1] == ".point\n  .sub"


def test_pptx_table_shape():
    b = build_pptx([[{"top": 0, "left": 0,
                      "table": [["h1", "h2"], ["a", "b"], ["c", "d"]]}]])
    assert pptx_slides(b) == ["h1: a; h2: b\nh1: c; h2: d"]


def test_pptx_page_window():
    b = build_pptx([[{"top": 0, "left": 0, "paras": [(f"s{i}", 0, False)]}]
                    for i in range(4)])
    assert pptx_slides(b, from_page=1, to_page=3) == ["s1", "s2"]
