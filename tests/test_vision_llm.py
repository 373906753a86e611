"""VisionParser route: slot contract, transcription rules, oracle constants.

Reference behaviors pinned: pdf_parser.py:1262-1306 (page loop, page-range
skip, empty-answer drop), picture.py:80-84 ('\\n' + answer section prefix),
prompts.py:369-395 (word-for-word + page divider), figure_parser.py:86-88
(describe text PREPENDED to the caption join).
"""

import math
import os

import pytest

from ragflow_core16_spark.chunkers.naive import naive_merge_with_counts
from ragflow_core16_spark.media.codecs import decode_png
from ragflow_core16_spark.operators.sql_shared import bpe_cost, bpe_count
from ragflow_core16_spark.operators.vision_llm import (
    VisionParser, VisionSlot, describe_figure_md, render_page_png,
    transcribe_boxes, vision_llm_describe_prompt)
from ragflow_core16_spark.pdf.plain import build_pdf


def _mk(top, text, size=12, x0=72):
    return {"x0": x0, "x1": x0 + 6 * len(text), "top": top,
            "bottom": top + size, "text": text, "page_number": 1}


def _pdf(n_words=450):
    words = ("spark table join merge sort scan row key hash value "
             * math.ceil(n_words / 10)).split()[:n_words]
    pages, page = [], []
    for i in range(0, len(words), 10):
        page.append(" ".join(words[i:i + 10]) + ".")
        if len(page) == 40:
            pages.append(page)
            page = []
    if page:
        pages.append(page)
    return build_pdf(pages), words


class TestTranscribe:
    def test_reading_order_and_divider(self):
        md = transcribe_boxes([_mk(40, "second line"), _mk(20, "first line")],
                              page_no=3)
        assert md == "first line\nsecond line\n--- Page 3 ---"

    def test_heading_rule_from_oversize(self):
        md = transcribe_boxes([_mk(10, "Big Title", size=24),
                               _mk(60, "body one"), _mk(80, "body two")])
        assert md.splitlines()[0] == "## Big Title"

    def test_empty_page_empty_string(self):
        assert transcribe_boxes([], page_no=1) == ""

    def test_prompt_divider_clause(self):
        assert "--- Page 7 ---" in vision_llm_describe_prompt(page=7)
        assert "Page" not in vision_llm_describe_prompt()


class TestVisionParser:
    def test_sections_one_per_page_with_nl_prefix(self):
        pdf, _w = _pdf(450)  # 45 lines → 2 pages
        secs, tbls = VisionParser()(pdf)
        assert tbls == []
        assert len(secs) == 2
        for i, (doc, pos) in enumerate(secs, start=1):
            assert pos == ""
            assert doc.startswith("\n")
            assert doc.endswith(f"--- Page {i} ---")

    def test_page_range_skip(self):
        pdf, _w = _pdf(450)
        secs, _ = VisionParser()(pdf, from_page=1)
        assert len(secs) == 1 and secs[0][0].endswith("--- Page 2 ---")
        secs, _ = VisionParser()(pdf, to_page=1)
        assert len(secs) == 1 and secs[0][0].endswith("--- Page 1 ---")

    def test_chunk_token_counts_exact(self):
        pdf, _w = _pdf(450)
        secs, _ = VisionParser()(pdf)
        cks, tk = naive_merge_with_counts(secs, 128)
        for c, t in zip(cks, tk):
            assert bpe_count(c) == t

    def test_slot_env_plug_routes_pixels(self, monkeypatch):
        monkeypatch.setenv(VisionSlot.ENV,
                           "tests.test_vision_llm:_fake_vlm")
        pdf, _w = _pdf(40)
        secs, _ = VisionParser()(pdf)
        assert secs == [("\nFAKE(PNG ok)", "")]


def _fake_vlm(png: bytes, prompt: str) -> str:
    ok = png.startswith(b"\x89PNG") and "Transcribe" in prompt
    return f"FAKE(PNG {'ok' if ok else 'bad'})"


class TestRaster:
    def test_png_round_trip_and_ink(self):
        png = render_page_png([_mk(100, "hello world")])
        img = decode_png(png)
        assert img["w"] == 153 and img["h"] == 198
        assert 0x30 in img["pixels"]


class TestOracleConstants:
    """The closed forms VISION_PDF_SQL relies on, against the real encoder."""

    def test_line_cost_composition(self):
        ws = ["spark", "table", "join", "merge", "sort",
              "scan", "row", "key", "hash", "value"]
        line = " ".join(ws) + "."
        assert bpe_count(line) == (bpe_cost(ws[0])
                                   + sum(bpe_cost(" " + w) for w in ws[1:])
                                   + 1)
        assert bpe_count("\n" + line) == 1 + bpe_count(line)

    @pytest.mark.parametrize("pn", [1, 9, 42, 999, 1000])
    def test_divider_cost_formula(self, pn):
        assert (bpe_count(f"\n--- Page {pn} ---")
                == 10 + math.ceil(len(str(pn)) / 3))


class TestFigureDescribe:
    def test_skeleton_from_caption_only(self):
        assert describe_figure_md("  a  b ") == \
            "- Visual Type: figure\n- Title: a b"
        assert describe_figure_md("") == ""


class TestEdgeCases:
    def test_blank_middle_page_dropped_not_renumbered(self):
        """Empty transcriptions are dropped but page numbering stays
        anchored to the PDF page (pdf_parser.py:1291-1304: the loop indexes
        real pages; only empty answers vanish)."""
        from ragflow_core16_spark.pdf.plain import build_pdf
        pdf = build_pdf([[" "], ["real line here"]])
        secs, _ = VisionParser()(pdf)
        assert len(secs) == 1
        assert secs[0][0].endswith("--- Page 2 ---")

    def test_all_blank_pdf_yields_no_sections(self):
        from ragflow_core16_spark.pdf.plain import build_pdf
        secs, tbls = VisionParser()(build_pdf([[" "]]))
        assert secs == [] and tbls == []

    def test_invalid_pdf_bytes_yield_no_sections(self):
        secs, tbls = VisionParser()(b"not a pdf at all")
        assert secs == [] and tbls == []
