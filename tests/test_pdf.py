"""PDF layer tests: writer/reader round trip, geometry, box ops, TSR."""

from ragflow_core16_spark.pdf.plain import (build_pdf, extract_pdf_boxes,
                                            extract_pdf_lines, PlainParser)
from ragflow_core16_spark.pdf.geometry import (
    sort_Y_firstly, sort_X_firstly, overlapped_area, find_overlapped,
    find_overlapped_with_threashold, layouts_cleanup)
from ragflow_core16_spark.pdf.boxops import (
    text_merge, naive_vertical_merge, filter_forpages,
    merge_with_same_bullet, sort_X_by_page, line_tag, remove_tag)
from ragflow_core16_spark.pdf.tsr import construct_table, block_type


def mk(x0, top, x1, bottom, text="t", page=1, **kw):
    return {"x0": x0, "x1": x1, "top": top, "bottom": bottom,
            "text": text, "page_number": page, **kw}


class TestPlainPdf:
    def test_round_trip(self):
        pdf = build_pdf([["line one", "line two"], ["second page"]])
        lines = [t for t, _ in extract_pdf_lines(pdf)]
        assert lines == ["line one", "line two", "second page"]

    def test_escapes(self):
        pdf = build_pdf([["with (parens) and \\ slash"]])
        assert extract_pdf_lines(pdf)[0][0] == "with (parens) and \\ slash"

    def test_uncompressed(self):
        pdf = build_pdf([["plain"]], compress=False)
        assert extract_pdf_lines(pdf)[0][0] == "plain"

    def test_boxes_have_geometry(self):
        pdf = build_pdf([["a", "b"]])
        boxes = extract_pdf_boxes(pdf)
        assert boxes[0]["top"] < boxes[1]["top"]
        assert all(b["page_number"] == 1 for b in boxes)

    def test_plain_parser_api(self):
        lines, tbls = PlainParser()(build_pdf([["x"]]))
        assert lines == [("x", "")] and tbls == []

    def test_garbage_pdf_no_crash(self):
        assert extract_pdf_lines(b"%PDF-1.4 garbage") == []

    def test_compressed_payload_containing_pdf_keywords(self):
        # regression: a Flate payload can contain literal 'endobj'/'endstream'
        # bytes; the object scan must be /Length-driven, not regex-truncated
        import zlib
        for seed_text in ("a table batch filter agg vector query column "
                          "batch big data group group slow", "x " * 400):
            lines = [seed_text[i:i + 40] for i in range(0, len(seed_text), 40)]
            pdf = build_pdf([lines])
            got = [t for t, _ in extract_pdf_lines(pdf)]
            assert got == [ln for ln in lines if ln.strip()]


class TestGeometry:
    def test_sort_y_threshold_tiebreak(self):
        a, b = mk(50, 10, 60, 20), mk(10, 12, 20, 22)
        assert sort_Y_firstly([a, b], 5)[0] is b  # y within 5 → x decides

    def test_sort_x(self):
        a, b = mk(50, 10, 60, 20), mk(10, 40, 20, 50)
        assert sort_X_firstly([a, b], 1)[0] is b

    def test_overlap_ratio(self):
        a = mk(0, 0, 10, 10)
        b = mk(5, 0, 15, 10)
        assert abs(overlapped_area(a, b) - 0.5) < 1e-9
        assert overlapped_area(a, mk(20, 20, 30, 30)) == 0

    def test_find_overlapped(self):
        boxes = [mk(0, i * 10, 100, i * 10 + 8) for i in range(50)]
        probe = mk(0, 101, 100, 107)
        i = find_overlapped(probe, boxes)
        assert i == 10

    def test_find_overlapped_threshold(self):
        boxes = [mk(0, 0, 10, 10), mk(0, 20, 10, 30)]
        probe = mk(0, 21, 10, 29)
        assert find_overlapped_with_threashold(probe, boxes) == 1

    def test_layouts_cleanup(self):
        l1 = mk(0, 0, 10, 10, type="text", score=0.9)
        l2 = mk(1, 1, 9, 9, type="text", score=0.5)
        out = layouts_cleanup([], [l1, l2])
        assert out == [l1]


class TestBoxOps:
    def test_text_merge_same_layout(self):
        b1 = mk(0, 10, 50, 20, "hello ", layoutno="t0")
        b2 = mk(55, 11, 90, 21, "world", layoutno="t0")
        out = text_merge([b1, b2], mean_height=[10])
        assert len(out) == 1 and out[0]["text"] == "hello world"

    def test_text_merge_different_layout_kept(self):
        b1 = mk(0, 10, 50, 20, "a", layoutno="t0")
        b2 = mk(55, 11, 90, 21, "b", layoutno="t1")
        assert len(text_merge([b1, b2], [10])) == 2

    def test_vertical_merge_continuation(self):
        b1 = mk(0, 10, 100, 20, "clause one,", layoutno=0)
        b2 = mk(0, 22, 100, 32, "clause two.", layoutno=0)
        out = naive_vertical_merge([b1, b2], [10], [5], False, 10)
        assert len(out) == 1 and out[0]["text"] == "clause one,clause two."

    def test_vertical_merge_sentence_stop(self):
        b1 = mk(0, 10, 100, 20, "Sentence ends.", layoutno=0)
        b2 = mk(0, 22, 100, 32, "New one", layoutno=0)
        out = naive_vertical_merge([b1, b2], [10], [5], True, 10)
        assert len(out) == 2

    def test_vertical_merge_drops_page_number(self):
        b1 = mk(0, 10, 100, 20, "12", page=1)
        b2 = mk(0, 22, 100, 32, "real text", page=2)
        out = naive_vertical_merge([b1, b2], [10, 10], [5, 5], False, 10)
        assert [b["text"] for b in out] == ["real text"]

    def test_filter_forpages_toc(self):
        boxes = [mk(0, 0, 10, 10, "contents"),
                 mk(0, 20, 10, 30, "Chapter One 1"),
                 mk(0, 40, 10, 50, "Chapter Two 2"),
                 mk(0, 60, 10, 70, "Chapter One body starts")]
        out = filter_forpages(boxes, 1)
        texts = [b["text"] for b in out]
        assert "contents" not in texts
        assert "Chapter One body starts" in texts

    def test_merge_same_bullet(self):
        b1 = mk(0, 10, 50, 20, "• first")
        b2 = mk(0, 30, 50, 40, "• second")
        out = merge_with_same_bullet([b1, b2])
        assert len(out) == 1 and "first" in out[0]["text"] and "second" in out[0]["text"]

    def test_sort_x_by_page_columns(self):
        left_top = mk(10, 10, 100, 20, "L1")
        left_bot = mk(10, 100, 100, 110, "L2")
        right_top = mk(300, 10, 400, 20, "R1")
        out = sort_X_by_page([right_top, left_bot, left_top], 50)
        assert [b["text"] for b in out] == ["L1", "L2", "R1"]

    def test_line_tag_roundtrip(self):
        b = mk(10, 50, 100, 60, page=1)
        tag = line_tag(b, [0, 792], [792, 792])
        assert tag.startswith("@@1\t") and tag.endswith("##")
        assert remove_tag(f"text{tag}") == "text"


def grid_boxes(nrows, ncols, header=True):
    """Synthetic tagged grid: cell (i,j) with R/C tags + extents."""
    boxes = []
    for i in range(nrows):
        for j in range(ncols):
            top, bottom = i * 20, i * 20 + 15
            x0, x1 = j * 100, j * 100 + 80
            b = mk(x0, top, x1, bottom,
                   text=(f"h{j}" if (header and i == 0) else f"c{i}{j}"))
            b["R"] = i
            b["R_top"], b["R_bott"] = top, bottom
            b["C"] = j
            b["C_left"], b["C_right"] = x0, x1
            if header and i == 0:
                b["H"] = 1
                b["H_left"], b["H_right"] = x0, x1
                b["H_top"], b["H_bott"] = top, bottom
            boxes.append(b)
    return boxes


class TestTSR:
    def test_html_table_basic(self):
        html = construct_table(grid_boxes(3, 2), is_english=True, html=True)
        assert html.startswith("<table>")
        assert html.count("<th") == 2 and html.count("<td") == 4
        assert "c11" in html and "h0" in html

    def test_desc_table_linearization(self):
        rows = construct_table(grid_boxes(3, 3), is_english=True, html=False)
        joined = "\n".join(rows)
        assert "h0：c10" in joined and "h2：c22" in joined

    def test_caption_extracted(self):
        boxes = grid_boxes(2, 2)
        boxes.append(mk(0, -30, 100, -20, "表 1: 数据", layout_type="table caption"))
        html = construct_table(boxes, html=True)
        assert "<caption>表 1: 数据</caption>" in html

    def test_spanning_cell(self):
        boxes = grid_boxes(3, 2)
        # make the row-1 col-0 cell span both columns
        sp = boxes[2]
        sp["SP"] = 1
        sp["H_left"], sp["H_right"] = 0, 180
        sp["H_top"], sp["H_bott"] = sp["top"], sp["bottom"]
        html = construct_table(boxes, is_english=True, html=True)
        assert "colspan=2" in html

    def test_block_type(self):
        assert block_type({"text": "2024-01-02"}) == "Dt"
        assert block_type({"text": "123.45"}) == "Nu"
        assert block_type({"text": "ABC-12"}) == "Ca"
        assert block_type({"text": "hello there"}) == "En"
        assert block_type({"text": "文"}) == "Sg"


class TestConcatDownward:
    """Model-scored down-concat (pdf_parser.py:125-180, 472-579)."""

    @staticmethod
    def _box(text, page=1, x0=50.0, x1=400.0, top=100.0, bottom=112.0,
             layout_type="text", layoutno="text-0"):
        return {"text": text, "page_number": page, "x0": x0, "x1": x1,
                "top": top, "bottom": bottom, "layout_type": layout_type,
                "layoutno": layoutno}

    def test_feature_vector_shape_and_key_flags(self):
        from ragflow_core16_spark.pdf.concat import updown_concat_features
        up = self._box("this sentence continues，", bottom=112.0)
        down = self._box("with a second line.", top=114.0, bottom=126.0)
        up["in_row"], down["in_row"] = 0, 0
        fea = updown_concat_features(up, down)
        assert len(fea) == 32
        assert fea[8] is False          # up does not end with terminal punct
        assert fea[9] is True           # up ends with a (fullwidth) comma
        assert fea[3] is True           # same layout type
        # reference duplicates the comma-tail feature at 12/13
        assert fea[12] == fea[13]
        up2 = self._box("sentence ended.")
        up2["in_row"] = 0
        fea2 = updown_concat_features(up2, down)
        assert fea2[8] is True

    def test_rule_scorer_dangling_comma_concats(self):
        from ragflow_core16_spark.pdf.concat import (rule_scorer,
                                                     updown_concat_features)
        up = self._box("first half of a clause,", bottom=112.0)
        down = self._box("second half finishes it.", top=114.0, bottom=126.0)
        up["in_row"], down["in_row"] = 0, 0
        assert rule_scorer(updown_concat_features(up, down)) > 0.5

    def test_rule_scorer_bullet_breaks(self):
        from ragflow_core16_spark.pdf.concat import (rule_scorer,
                                                     updown_concat_features)
        up = self._box("previous item ends here.", bottom=112.0)
        down = self._box("2. next numbered item starts", top=114.0,
                         bottom=126.0)
        up["in_row"], down["in_row"] = 0, 0
        assert rule_scorer(updown_concat_features(up, down)) <= 0.5

    def test_concat_downward_fast_path_same_layoutno(self):
        from ragflow_core16_spark.pdf.concat import concat_downward
        boxes = [
            self._box("alpha beta", top=100.0, bottom=112.0),
            self._box("gamma delta", top=114.0, bottom=126.0),
            self._box("epsilon zeta", top=128.0, bottom=140.0),
        ]
        out = concat_downward(boxes, mean_height=[12.0], mean_width=[6.0])
        assert len(out) == 1
        assert out[0]["text"] == "alpha beta gamma delta epsilon zeta"
        assert out[0]["bottom"] == 140.0

    def test_concat_downward_respects_column_gap(self):
        from ragflow_core16_spark.pdf.concat import concat_downward
        left = self._box("left column text", x0=50.0, x1=200.0,
                         layoutno="text-0")
        right = self._box("right column text", x0=1500.0, x1=1700.0,
                          top=114.0, bottom=126.0, layoutno="text-1")
        out = concat_downward([left, right], mean_height=[12.0],
                              mean_width=[6.0])
        assert len(out) == 2


class TestTwoColumnPaper:
    def test_sort_x_by_page_restores_column_reading_order(self):
        from ragflow_core16_spark.pdf.plain import (build_pdf_positioned,
                                                    extract_pdf_boxes)
        from ragflow_core16_spark.pdf.boxops import sort_X_by_page
        from ragflow_core16_spark.pdf.geometry import sort_Y_firstly
        page = [(72, 720, "L1"), (72, 704, "L2"), (72, 688, "L3"),
                (320, 720, "R1"), (320, 704, "R2"), (320, 688, "R3")]
        boxes = extract_pdf_boxes(build_pdf_positioned([page]))
        # Y-sort interleaves the columns (L1 R1 L2 R2 ...)
        boxes = sort_Y_firstly(boxes, 6.0)
        interleaved = [b["text"] for b in boxes]
        assert interleaved == ["L1", "R1", "L2", "R2", "L3", "R3"]
        # the column-aware reorder restores reading order
        widths = [b["x1"] - b["x0"] for b in boxes]
        restored = [b["text"] for b in sort_X_by_page(boxes, max(widths) / 2)]
        assert restored == ["L1", "L2", "L3", "R1", "R2", "R3"]

    def test_paper_route_emits_abstract_first(self, spark):
        from ragflow_core16_spark.operators.pdf_extract import \
            paper_pdf_template
        df = paper_pdf_template(spark, "/root/testdata/sf0.001")
        rows = df.filter("doc_id = 1").collect()
        assert rows[0].is_abstract == 1
        assert rows[0].chunk_text.startswith("abstract ")
        assert all(r.is_abstract == 0 for r in rows[1:])


class TestFilteroutScraps:
    """Full-mode scrap filtering (pdf_parser.py:869-891, 910-980)."""

    def test_proj_match_levels(self):
        from ragflow_core16_spark.pdf.boxops import proj_match
        assert proj_match("1. introduction") == 5
        assert proj_match("1.2 methods here") == 6
        assert proj_match("第一章 总则") == 1
        assert proj_match("short headings end with:") == 9
        assert proj_match("12") is None          # too short
        assert proj_match("123 45.6%") is False  # numeric line

    def test_narrow_scraps_dropped_wide_lines_kept(self):
        from ragflow_core16_spark.pdf.boxops import filterout_scraps
        wide = mk(50, 100, 500, 112, "a full width paragraph line of text")
        wide2 = mk(50, 114, 500, 126, "continuing the same paragraph here")
        scrap = mk(560, 100, 600, 110, "fig 3")
        out = filterout_scraps([wide, wide2, scrap],
                               mean_height=[12.0], page_widths=[612.0])
        assert "full width paragraph" in out
        assert "continuing the same paragraph" in out
        assert "fig 3" not in out

    def test_bullet_led_narrow_run_kept(self):
        from ragflow_core16_spark.pdf.boxops import filterout_scraps
        # bullet-led runs are kept regardless of width (mj short-circuit);
        # taller-than-mean boxes pass the usefull() gate
        b1 = mk(50, 100, 200, 114, "1. short bullet")
        b2 = mk(50, 116, 200, 130, "more of the item")
        out = filterout_scraps([b1, b2], [12.0], [612.0])
        assert "short bullet" in out and "more of the item" in out

    def test_long_aligned_run_no_duplication(self):
        # regression: recursive walk overflowed and re-emitted runs
        from ragflow_core16_spark.pdf.boxops import filterout_scraps
        boxes = [mk(50, 100 + 14 * i, 500, 112 + 14 * i,
                    f"row {i} body text") for i in range(2500)]
        out = filterout_scraps(boxes, [12.0], [612.0])
        assert out.count("row 7 body text") == 1
        assert out.count("row 2499 body text") == 1

    def test_chain_walk_keeps_consecutive_boxes(self):
        # regression (ADVICE r1): after a chain hop to index nxt the next
        # search window must start at nxt+1 (reference dfs searches
        # range(i+1, ...)), not nxt+2 — 4 aligned boxes are ONE run,
        # in order, not [0,1,3] + [2]
        from ragflow_core16_spark.pdf.boxops import filterout_scraps
        boxes = [mk(50, 100 + 14 * i, 500, 112 + 14 * i,
                    f"row{i} aligned body text") for i in range(4)]
        out = filterout_scraps(boxes, [12.0], [612.0])
        assert out.split("\n\n") == [
            "row0 aligned body text\nrow1 aligned body text\n"
            "row2 aligned body text\nrow3 aligned body text"]


class TestExtractTableFigure:
    """_extract_table_figure parity (pdf_parser.py:656-867)."""

    @staticmethod
    def _mk(x0, top, x1, bottom, text, page=1, lt="text", ln="x"):
        return {"x0": x0, "top": top, "x1": x1, "bottom": bottom,
                "text": text, "page_number": page,
                "layout_type": lt, "layoutno": ln}

    def _grid(self, page, y0, ln="t0", rows=2):
        out = []
        for r in range(rows):
            for c in range(2):
                out.append(self._mk(72 + 100 * c, y0 + 20 * r,
                                    152 + 100 * c, y0 + 20 * r + 12,
                                    str(10 * c + r), page=page,
                                    lt="table", ln=ln))
        return out

    def test_source_lines_dropped(self):
        from ragflow_core16_spark.pdf.tablefig import extract_table_figure
        boxes = self._grid(1, 100)
        boxes.append(self._mk(72, 150, 200, 162, "数据来源：wind",
                              lt="table", ln="t0"))
        rem, res = extract_table_figure(boxes, [12.0])
        assert not rem
        assert len(res) == 1
        assert "来源" not in str(res[0]["content"])

    def test_cross_page_gap_blocks_merge(self):
        from ragflow_core16_spark.pdf.tablefig import extract_table_figure
        # gap 400 > 23*12: two separate tables
        boxes = self._grid(1, 100) + self._grid(2, 540)
        rem, res = extract_table_figure(boxes, [12.0, 12.0])
        assert len(res) == 2
        # gap 24 <= 276: merged
        boxes = self._grid(1, 100) + self._grid(2, 160)
        rem, res = extract_table_figure(boxes, [12.0, 12.0])
        assert len(res) == 1
        assert len(res[0]["poss"]) == 2

    def test_caption_between_blocks_merge(self):
        from ragflow_core16_spark.pdf.tablefig import extract_table_figure
        boxes = self._grid(1, 100)
        # caption right after the page-1 group marks it no-merge
        boxes.append(self._mk(72, 145, 200, 157, "tbl one caption",
                              lt="table caption", ln="cap"))
        boxes += self._grid(2, 170, ln="t1")
        rem, res = extract_table_figure(boxes, [12.0, 12.0])
        assert len(res) == 2

    def test_caption_popped_even_without_groups(self):
        from ragflow_core16_spark.pdf.tablefig import extract_table_figure
        boxes = [self._mk(72, 100, 200, 112, "body text here", ln="x0"),
                 self._mk(72, 130, 200, 142, "orphan cap",
                          lt="figure caption", ln="c0")]
        rem, res = extract_table_figure(boxes, [12.0])
        assert [b["text"] for b in rem] == ["body text here"]
        assert res == []

    def test_nearest_tie_goes_to_figure(self):
        # reference: `if tv < fv and tk` — a strict inequality, so an
        # exact distance tie attaches the caption to the FIGURE branch
        from ragflow_core16_spark.pdf.tablefig import extract_table_figure
        boxes = self._grid(1, 100)
        boxes.append(self._mk(72, 200, 200, 212, "fig body",
                              lt="figure", ln="f0"))
        # equidistant: table row-1 center 126, figure center 206, cap 166
        boxes.append(self._mk(72, 160, 200, 172, "shared cap",
                              lt="table caption", ln="c0"))
        rem, res = extract_table_figure(boxes, [12.0])
        fig = [r for r in res if r["type"] == "figure"][0]
        assert "shared cap" in fig["content"]
        # nudge the caption 2pt up: the table now strictly wins
        boxes = self._grid(1, 100)
        boxes.append(self._mk(72, 200, 200, 212, "fig body",
                              lt="figure", ln="f0"))
        boxes.append(self._mk(72, 158, 200, 170, "shared cap",
                              lt="table caption", ln="c0"))
        rem, res = extract_table_figure(boxes, [12.0])
        tbl = [r for r in res if r["type"] == "table"][0]
        assert "shared cap" in str(tbl["content"])


class TestCrop:
    """Chunk snippet crop geometry (pdf_parser.py:1129-1208) over numpy
    page images; the rasterizer is the injectable stage."""

    @staticmethod
    def _pages(n=2, h=300, w=200):
        import numpy as np
        pages = []
        for p in range(n):
            a = np.zeros((h, w, 3), dtype=np.uint8)
            a[:, :, 0] = 10 + p          # page marker in the red channel
            pages.append(a)
        return pages

    def test_no_tags_returns_none(self):
        from ragflow_core16_spark.pdf.crop import crop
        assert crop("plain text", self._pages()) is None
        assert crop("plain", self._pages(), need_position=True) == (None, None)

    def test_single_region_with_context_strips(self):
        import numpy as np
        from ragflow_core16_spark.pdf.crop import crop, parse_position_tags
        text = "chunk@@1\t10.0\t60.0\t50.0\t70.0##"
        assert parse_position_tags(text) == [([0], 10.0, 60.0, 50.0, 70.0)]
        img, pos = crop(text, self._pages(), zoom=1, need_position=True)
        # three strips: context-above (dimmed), region, context-below
        assert pos == [(0, 10.0, 60.0, 50.0, 70.0)]
        # total height = 44 (ctx above: 50-6-(50-120→0)) + 20 + 44-ish + gaps
        assert img.shape[1] == 50                 # max_width
        # the middle strip keeps the page's red marker undimmed
        mid = img[50, 5]
        assert mid[0] == 10
        # first rows are the dimmed context strip: 10*127//255 = 4
        assert img[0, 5][0] == 4

    def test_multi_page_span(self):
        from ragflow_core16_spark.pdf.crop import crop
        # region spans pages 1-2: bottom accumulates page-1 height
        text = "x@@1-2\t0.0\t100.0\t280.0\t40.0##"
        img, pos = crop(text, self._pages(h=300), zoom=1, need_position=True)
        assert len(pos) == 2
        assert pos[0][0] == 0 and pos[1][0] == 1
        assert img is not None and img.shape[1] == 100

    def test_out_of_page_clips_black(self):
        from ragflow_core16_spark.pdf.crop import _region
        import numpy as np
        page = np.full((50, 50, 3), 200, dtype=np.uint8)
        r = _region(page, 40, 40, 70, 60)       # 30x20 request, partial
        assert r.shape == (20, 30, 3)
        assert r[0, 0][0] == 200                # in-page corner
        assert r[-1, -1][0] == 0                # out-of-page black

    def test_png_encoding_round_trip(self):
        from ragflow_core16_spark.media.codecs import decode_png
        from ragflow_core16_spark.pdf.crop import crop_png
        png = crop_png("c@@1\t0.0\t30.0\t10.0\t20.0##", self._pages(), zoom=1)
        img = decode_png(png)
        assert img["channels"] == 3 and img["w"] == 30
