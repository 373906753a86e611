"""Layout recognizer glue + rule proposer (pdf/layout.py) vs the
reference semantics in deepdoc/vision/layout_recognizer.py:60-157."""

from ragflow_core16_spark.pdf.layout import (is_garbage_text, layouts_rec,
                                             propose_layouts, tag_layouts)

W, H = 612.0, 792.0


def box(x0, top, x1, bottom, text=""):
    return {"x0": x0, "top": top, "x1": x1, "bottom": bottom, "text": text}


def region(ty, x0, top, x1, bottom, score=1.0):
    return {"type": ty, "score": score, "x0": x0, "x1": x1,
            "top": top, "bottom": bottom}


class TestGarbageText:
    def test_patterns(self):
        assert is_garbage_text("•••")
        assert is_garbage_text("3 / 10")
        assert is_garbage_text("3 /10")
        assert is_garbage_text("7 of 12")
        assert is_garbage_text("http://example.com/some/long/path")
        assert is_garbage_text("text with (cid: 42) artifact")
        assert not is_garbage_text("plain paragraph text")
        assert not is_garbage_text("• leading bullet with words")


class TestTagLayouts:
    def test_text_assignment(self):
        bxs = [box(72, 100, 300, 112, "hello world")]
        lts = [region("text", 70, 98, 302, 114)]
        boxes, pl = tag_layouts([bxs], [lts], [H])
        assert boxes[0]["layout_type"] == "text"
        assert boxes[0]["layoutno"] == "text-0"
        assert len(pl[0]) == 1

    def test_no_overlap_leaves_empty_type(self):
        bxs = [box(72, 100, 300, 112, "orphan")]
        lts = [region("text", 400, 400, 500, 500)]
        boxes, _ = tag_layouts([bxs], [lts], [H])
        assert boxes[0]["layout_type"] == ""
        assert "layoutno" not in boxes[0]

    def test_footer_region_drops_box(self):
        bxs = [box(72, 760, 300, 772, "Confidential Corp")]
        lts = [region("footer", 70, 758, 302, 774)]
        boxes, _ = tag_layouts([bxs], [lts], [H])
        assert boxes == []

    def test_footer_keep_feat_high_on_page(self):
        # a "footer" region high on the page is a model false positive:
        # box bottom < 0.9*H fires the keep-feat and the box survives
        bxs = [box(72, 100, 300, 112, "not actually a footer")]
        lts = [region("footer", 70, 98, 302, 114)]
        boxes, _ = tag_layouts([bxs], [lts], [H])
        assert len(boxes) == 1
        assert boxes[0]["layout_type"] == "footer"

    def test_header_keep_feat_low_on_page(self):
        bxs = [box(72, 400, 300, 412, "not actually a header")]
        lts = [region("header", 70, 398, 302, 414)]
        boxes, _ = tag_layouts([bxs], [lts], [H])
        assert len(boxes) == 1
        assert boxes[0]["layout_type"] == "header"

    def test_equation_folds_to_figure(self):
        bxs = [box(72, 100, 300, 112, "E = mc^2")]
        lts = [region("equation", 70, 98, 302, 114)]
        boxes, _ = tag_layouts([bxs], [lts], [H])
        assert boxes[0]["layout_type"] == "figure"
        assert boxes[0]["layoutno"] == "equation-0"

    def test_unvisited_figure_placeholder(self):
        bxs = [box(72, 100, 300, 112, "body", )]
        lts = [region("text", 70, 98, 302, 114),
               region("figure", 70, 300, 302, 400)]
        boxes, _ = tag_layouts([bxs], [lts], [H])
        ph = [b for b in boxes if b["text"] == ""]
        assert len(ph) == 1
        assert ph[0]["layout_type"] == "figure"
        assert ph[0]["layoutno"] == "figure-0"

    def test_placeholder_inherits_page_number_convention(self):
        # real boxes carry 1-based page_number; the placeholder must key
        # into the SAME per-page grouping downstream (documented
        # divergence from the reference's 0-based region index)
        b1 = dict(box(72, 100, 300, 112, "body"), page_number=2)
        lts = [region("text", 70, 98, 302, 114),
               region("figure", 70, 300, 302, 400)]
        boxes, _ = tag_layouts([[b1]], [lts], [H])
        ph = [b for b in boxes if b["text"] == ""][0]
        assert ph["page_number"] == 2
        # pages with no page_number key fall back to 1-based index
        boxes2, _ = tag_layouts([[box(72, 100, 300, 112, "x")]],
                                [[region("figure", 70, 300, 302, 400)]],
                                [H])
        ph2 = [b for b in boxes2 if b["text"] == ""][0]
        assert ph2["page_number"] == 1

    def test_garbage_regex_pops_before_assignment(self):
        bxs = [box(72, 100, 300, 112, "2 / 9")]
        lts = [region("text", 70, 98, 302, 114)]
        boxes, _ = tag_layouts([bxs], [lts], [H])
        assert boxes == []

    def test_repeated_garbage_kill_set(self):
        # the SAME text dropped in a garbage bin on 2 pages forms the
        # kill set; a third copy that survived tagging (mid-page, tagged
        # text) is removed at the end (layout_recognizer.py:148-156)
        head = "running head"
        pages = [
            [box(72, 20, 300, 32, head)],
            [box(72, 20, 300, 32, head),
             box(72, 300, 300, 312, head),
             box(72, 400, 300, 412, "real paragraph")],
        ]
        lts = [
            [region("header", 70, 18, 302, 34)],
            [region("header", 70, 18, 302, 34),
             region("text", 70, 298, 302, 414)],
        ]
        boxes, _ = tag_layouts(pages, lts, [H, H])
        texts = [b["text"] for b in boxes]
        assert head not in texts
        assert "real paragraph" in texts

    def test_single_garbage_occurrence_not_killed_elsewhere(self):
        # dropped once only → Counter == 1 → an identical surviving text
        # elsewhere is NOT removed
        pages = [
            [box(72, 760, 300, 772, "unique note")],
            [box(72, 300, 300, 312, "unique note")],
        ]
        lts = [
            [region("footer", 70, 758, 302, 774)],
            [region("text", 70, 298, 302, 314)],
        ]
        boxes, _ = tag_layouts(pages, lts, [H, H])
        assert [b["text"] for b in boxes] == ["unique note"]

    def test_low_score_garbage_region_filtered(self):
        # score < 0.4 footer region is dropped from the region list; its
        # box is left untagged rather than deleted
        bxs = [box(72, 760, 300, 772, "kept: weak region")]
        lts = [region("footer", 70, 758, 302, 774, score=0.3)]
        boxes, pl = tag_layouts([bxs], [lts], [H])
        assert len(boxes) == 1
        assert boxes[0]["layout_type"] == ""
        assert pl[0] == []

    def test_garbage_type_priority_over_text(self):
        # a box inside BOTH a footer and a text region: the footer pass
        # runs first in the reference order, so the box is dropped
        bxs = [box(72, 760, 300, 772, "page bottom line")]
        lts = [region("text", 70, 758, 302, 774),
               region("footer", 70, 758, 302, 774)]
        boxes, _ = tag_layouts([bxs], [lts], [H])
        assert boxes == []


class TestProposeLayouts:
    def test_bands_and_regexes(self):
        bxs = [box(72, 20, 300, 32, "running head"),
               box(72, 100, 400, 112, "A Short Title"),
               box(72, 200, 540, 212, "¶ first body line"),
               box(72, 218, 540, 230, "¶ second body line"),
               box(72, 500, 300, 512, "Table 1 summary"),
               box(72, 530, 300, 542, "Figure 2 overview"),
               box(72, 760, 332, 772, "footer text")]
        regions = propose_layouts(bxs, W, H, 0)
        types = [r["type"] for r in regions]
        assert types == ["header", "title", "text", "table caption",
                         "figure caption", "footer"]

    def test_column_fusion_merges_adjacent_text(self):
        bxs = [box(72, 200, 540, 212, "a"),
               box(72, 218, 540, 230, "b"),
               box(72, 236, 540, 248, "c")]
        regions = propose_layouts(bxs, W, H, 0)
        assert len(regions) == 1
        assert regions[0]["type"] == "text"
        assert regions[0]["top"] <= 200 and regions[0]["bottom"] >= 248

    def test_reference_section_after_heading(self):
        bxs = [box(72, 200, 540, 212, "body before"),
               box(72, 600, 200, 612, "References"),
               box(72, 630, 400, 642, "[1] a source"),
               box(72, 648, 400, 660, "[2] another")]
        regions = propose_layouts(bxs, W, H, 1)
        assert regions[0]["type"] == "text"
        assert all(r["type"] == "reference" for r in regions[1:])

    def test_table_grid_under_caption(self):
        bxs = [box(72, 160, 540, 172, "¶ body before"),
               box(72, 200, 160, 212, "Table 1 results"),
               box(72, 224, 132, 236, "h1"), box(150, 224, 210, 236, "h2"),
               box(72, 244, 132, 256, "11"), box(150, 244, 210, 256, "12"),
               box(72, 264, 132, 276, "21"), box(150, 264, 210, 276, "22"),
               box(72, 400, 540, 412, "¶ body after")]
        regions = propose_layouts(bxs, W, H, 0)
        types = [r["type"] for r in regions]
        assert types == ["text", "table caption", "table", "text"]
        tbl = regions[types.index("table")]
        # one region spanning the whole 2x3 grid
        assert tbl["top"] <= 224 and tbl["bottom"] >= 276
        assert tbl["x0"] <= 72 and tbl["x1"] >= 210

    def test_grid_ends_at_single_box_row(self):
        bxs = [box(72, 200, 160, 212, "Table 2 summary"),
               box(72, 224, 132, 236, "a"), box(150, 224, 210, 236, "b"),
               box(72, 244, 540, 256, "¶ single full-width line")]
        regions = propose_layouts(bxs, W, H, 0)
        types = [r["type"] for r in regions]
        assert types == ["table caption", "table", "text"]

    def test_title_only_on_first_page(self):
        bxs = [box(72, 100, 400, 112, "Looks Like A Title")]
        assert propose_layouts(bxs, W, H, 0)[0]["type"] == "title"
        assert propose_layouts(bxs, W, H, 1)[0]["type"] == "text"


class TestLayoutProperties:
    """Hypothesis fuzz: a 10^12-page job meets arbitrary geometry; the
    recognizer must never crash, invent text, or duplicate a box."""

    from hypothesis import given, settings, strategies as st

    _boxes = st.lists(
        st.tuples(st.floats(0, 600, allow_nan=False),
                  st.floats(0, 780, allow_nan=False),
                  st.floats(1, 300, allow_nan=False),
                  st.floats(1, 14, allow_nan=False),
                  st.text(max_size=40)),
        max_size=25)

    @given(_boxes)
    @settings(max_examples=60, deadline=None)
    def test_never_crashes_output_is_subset(self, raw):
        bxs = [{"x0": x, "top": y, "x1": x + w, "bottom": y + h, "text": t}
               for x, y, w, h, t in raw]
        inputs = [b["text"] for b in bxs]
        boxes, pl = layouts_rec([bxs], W, H)
        for b in boxes:
            # every output is an input box (placeholders are empty-text)
            assert b["text"] == "" or inputs.count(b["text"]) >= 1
            assert "layout_type" in b
        # no duplication: output count never exceeds inputs + placeholders
        n_ph = sum(1 for b in boxes if b["text"] == "")
        assert len(boxes) - n_ph <= len(bxs)
        assert len(pl) == 1


class TestDeepdocSections:
    """Full naive-mode composition over REAL pdf bytes: reader →
    layouts_rec → text_merge → concat_downward → filter_forpages →
    extract_table_figure."""

    def test_real_pdf_route(self):
        from ragflow_core16_spark.pdf.plain import build_pdf_positioned
        from ragflow_core16_spark.operators.pdf_extract import \
            pdf_deepdoc_sections
        pdf = build_pdf_positioned([
            [(72, 770, "Running Head"),
             (72, 600, "first line of the paragraph continues and"),
             (72, 582, "second line keeps going without a stop and"),
             (72, 564, "the third line ends the paragraph."),
             (280, 30, "1 / 2")],
            [(72, 770, "Running Head"),
             (72, 600, "second page continues a new paragraph and"),
             (72, 582, "finishes here.")],
        ])
        secs, tbls = pdf_deepdoc_sections(pdf)
        joined = " ".join(secs)
        assert "Running Head" not in joined      # header band dropped
        assert "1 / 2" not in joined             # garbage regex popped
        assert "first line of the paragraph" in joined
        assert "finishes here." in joined
        # body lines merged into blocks, none lost
        for frag in ["continues and", "without a stop and",
                     "ends the paragraph."]:
            assert frag in joined
        assert tbls == []
        assert 1 <= len(secs) <= 4

    def test_scrambled_content_stream_order(self):
        # content streams may draw lines bottom-up or interleaved; the
        # route must sort into reading order before tagging/merging
        from ragflow_core16_spark.pdf.plain import build_pdf_positioned
        from ragflow_core16_spark.operators.pdf_extract import \
            pdf_deepdoc_sections
        lines = [(72, 600, "first line of the paragraph continues and"),
                 (72, 582, "second line keeps going without a stop and"),
                 (72, 564, "the third line ends the paragraph.")]
        fwd = build_pdf_positioned([list(lines)])
        rev = build_pdf_positioned([list(reversed(lines))])
        assert pdf_deepdoc_sections(fwd) == pdf_deepdoc_sections(rev)
        joined = " ".join(pdf_deepdoc_sections(rev)[0])
        assert joined.index("first line") < joined.index("third line")

    def test_empty_pdf(self):
        from ragflow_core16_spark.operators.pdf_extract import \
            pdf_deepdoc_sections
        assert pdf_deepdoc_sections(b"%PDF-1.4\n%%EOF") == ([], [])


class TestLayoutsRecE2E:
    def test_two_page_doc(self):
        head = "running head 7"
        p1 = [box(72, 20, 300, 32, head),
              box(72, 100, 400, 112, "Synthetic Report 7"),
              box(72, 160, 540, 172, "¶ one two three"),
              box(72, 178, 540, 190, "¶ four five six"),
              box(72, 700, 300, 712, "Figure 1 overview for doc 7"),
              box(280, 760, 332, 772, "1 / 2")]
        p2 = [box(72, 20, 300, 32, head),
              box(72, 150, 400, 162, head),
              box(72, 600, 200, 612, "References"),
              box(72, 630, 400, 642, "[1] source 7")]
        boxes, pl = layouts_rec([p1, p2], W, H)
        got = [(b["text"], b["layout_type"]) for b in boxes]
        assert got == [("Synthetic Report 7", "title"),
                       ("¶ one two three", "text"),
                       ("¶ four five six", "text"),
                       ("Figure 1 overview for doc 7", "figure caption")]
        assert len(pl) == 2
