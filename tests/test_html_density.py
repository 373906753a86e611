"""Density-strategy extraction (html/density.py): behavior pins.

Two kinds of tests: (1) agreement — on the synthetic corpus the density
strategy must match the readability port byte-for-byte (the
``extract_density_e2e`` oracle extends this to the full pipeline); and
(2) divergence — constructed pages where the two public algorithms
genuinely disagree, pinning that density.py is a real second algorithm,
not an alias of the readability path.
"""

import duckdb
import pytest

from ragflow_core16_spark.datagen.pages import document_page
from ragflow_core16_spark.html.density import (blocks_of, classify,
                                               density_sections)
from ragflow_core16_spark.html.dom import parse_html
from ragflow_core16_spark.html.parser import HtmlParser

SF = "/root/testdata/sf0.001"


def _secs(txt):
    return [s for s in density_sections(txt) if s]


def _ref(txt):
    return [s for s in HtmlParser.parser_txt(txt) if s]


class TestAgreement:
    def test_matches_readability_on_generator_corpus(self):
        rows = duckdb.sql(
            f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
            " ORDER BY doc_id").fetchall()
        for doc_id, text in rows:
            _url, _ts, html = document_page(int(doc_id), text)
            txt = html.decode("utf-8")
            assert _secs(txt) == _ref(txt), f"doc {doc_id} diverged"

    def test_matches_readability_on_hostile_corpus(self):
        from ragflow_core16_spark.datagen.pages import hostile_page
        rows = duckdb.sql(
            f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
            " ORDER BY doc_id").fetchall()
        for doc_id, text in rows:
            _url, _ts, html = hostile_page(int(doc_id), text)
            txt = html.decode("utf-8")
            assert _secs(txt) == _ref(txt), f"hostile doc {doc_id} diverged"


LONG = ("spark engine query market report supply demand price index "
        "growth policy analysis model system value stream batch table.")


class TestBlocks:
    def test_nav_ads_footer_dropped_paragraph_kept(self):
        txt = (f'<html><head><title>T</title></head><body>'
               f'<div class="nav"><a href="/a">alpha beta gamma delta</a> '
               f'<a href="/b">epsilon zeta eta theta</a></div>'
               f'<div class="ad">Sale! <a href="/buy">buy now</a></div>'
               f'<div class="content"><p>{LONG}</p></div>'
               f'<div class="footer">Copyright 2024 '
               f'<a href="/p">Privacy</a> <a href="/t">Terms</a></div>'
               f'</body></html>')
        assert _secs(txt) == ["T", LONG]

    def test_script_style_contribute_nothing(self):
        txt = (f'<html><body><script>var boilerplate = "not text";</script>'
               f'<style>p {{ color: red }}</style><p>{LONG}</p></body></html>')
        # title-less page: same '[no-title]' placeholder as the
        # readability route (Document.title), then the kept content
        assert _secs(txt) == ["[no-title]", LONG]
        assert _secs(txt) == _ref(txt)

    def test_svg_title_does_not_shadow_head_title(self):
        # an inline <svg><title> appears later in DOCUMENT order than the
        # head <title>; both strategies must return the real page title
        txt = (f'<html><head><title>Real Title</title></head><body>'
               f'<svg><title>icon label</title></svg><p>{LONG}</p>'
               f'</body></html>')
        assert _secs(txt)[0] == "Real Title"
        assert _secs(txt) == _ref(txt)

    def test_svg_title_only_page_matches_readability(self):
        # head-less page whose only <title> lives in an inline svg:
        # readability's Document.title() is a document-order find with no
        # subtree skipping, so BOTH routes surface the svg title — exact
        # mirroring beats a skip-list here (parity is the contract)
        txt = (f'<html><body><svg><title>icon label</title></svg>'
               f'<p>{LONG}</p></body></html>')
        assert _secs(txt) == _ref(txt)
        assert _secs(txt)[0] == "icon label"

    def test_titleless_empty_body_yields_no_title_placeholder(self):
        txt = '<html><body></body></html>'
        assert density_sections(txt)[0] == "[no-title]"
        assert _secs(txt) == _ref(txt)

    def test_div_direct_text_is_its_own_block(self):
        txt = f'<html><body><div>{LONG}</div><p>{LONG}</p></body></html>'
        assert _secs(txt) == ["[no-title]", LONG, LONG]

    def test_title_first_even_without_body_content(self):
        txt = '<html><head><title>Only Title</title></head><body></body></html>'
        assert density_sections(txt) == ["Only Title"]


class TestContextPromotion:
    def test_short_trailing_paragraph_promoted_by_good_neighbor(self):
        txt = (f'<html><body><p>{LONG}</p><p>value.</p></body></html>')
        assert _secs(txt) == ["[no-title]", LONG, "value."]

    def test_short_leading_paragraph_promoted_by_following_good(self):
        txt = (f'<html><body><p>value.</p><p>{LONG}</p></body></html>')
        assert _secs(txt) == ["[no-title]", "value.", LONG]

    def test_orphan_short_between_bad_blocks_dropped(self):
        txt = ('<html><body>'
               '<div><a href="/a">all link text here one</a></div>'
               '<p>tiny.</p>'
               '<div><a href="/b">all link text here two</a></div>'
               '</body></html>')
        assert _secs(txt) == ["[no-title]"]


class TestDivergenceFromReadability:
    """Pages where density and readability genuinely differ — proof the
    strategies are distinct algorithms."""

    def test_link_heavy_long_block_dropped_by_density_only(self):
        # a LONG block that is >20% anchor text: density drops it
        # unconditionally (JusText max_link_density); readability keeps
        # the container when its score survives
        linky = (f'<p>{LONG} <a href="/x">{LONG}</a></p>')
        txt = (f'<html><body><div class="content"><p>{LONG}</p>'
               f'{linky}</div></body></html>')
        d = _secs(txt)
        assert d == ["[no-title]", LONG]  # linky block gone
        r = _ref(txt)
        assert any("spark engine" in s and len(s) > len(LONG) for s in r), \
            "readability kept the link-heavy block (expected divergence)"


class TestClassifyUnits:
    def test_bad_overrides_length(self):
        blocks = [("x" * 100, 100, 50)]
        assert classify(blocks) == ["bad"]

    def test_good_at_length_low(self):
        blocks = [("x" * 20, 20, 0)]
        assert classify(blocks) == ["good"]

    def test_blocks_of_counts_link_chars(self):
        root = parse_html('<body><p>aa <a href="/x">bb cc</a></p></body>')
        [(text, chars, link_chars)] = blocks_of(root)
        assert text == "aa bb cc"
        assert chars == len("aa bb cc")
        assert link_chars == len("bb cc")


class TestSparkRoute:
    @pytest.mark.usefixtures("spark")
    def test_extract_density_matches_pages_oracle(self, spark):
        import __spark_entry__ as E
        from tests.oracle_compare import compare
        reg = E._registry()
        fn, sql = reg["extract_density_e2e"]
        res = compare(spark, SF, "extract_density_e2e", fn, sql)
        assert (res["rows_match"] and res["cols_match"]
                and res["values_match"]), res
