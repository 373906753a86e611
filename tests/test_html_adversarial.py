"""Adversarial real-world-HTML parity corpus (round-3 verdict item 2).

Each fixture under ``tests/fixtures/html/`` exercises one hostile
construct; its expected output is FROZEN from the ported readability-0.8.1
+ html-text-0.6.2 algorithm (``expected_sections.json``) and each test
names the 0.8.1/0.6.2 behavior it pins, citing the reference entry point
(``/root/reference/deepdoc/parser/html_parser.py:30-50``).  When a real
readability-lxml 0.8.1 environment is available, ``tests/golden/regen.py``
re-freezes these from the actual libraries.

The end-to-end twin of this corpus is the ``extract_hostile_e2e`` query
(``operators/extract_e2e.py``): the same hostile constructs over the full
derivable page corpus, oracle-pinned byte-for-byte to the CLEAN pages
derivation.
"""

from __future__ import annotations

import json
import os

import pytest

from ragflow_core16_spark.html.parser import HtmlParser

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "html")
EXPECTED = json.load(open(os.path.join(FIXDIR, "expected_sections.json")))


def _secs(name: str) -> list[str]:
    html = open(os.path.join(FIXDIR, name + ".html")).read()
    return HtmlParser.parser_txt(html)


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_frozen_sections(name):
    """Byte-frozen extraction output for every adversarial fixture."""
    assert _secs(name) == EXPECTED[name]


class TestBehaviors:
    """Each construct's specific 0.8.1/0.6.2 behavior, asserted
    independently of the frozen bytes."""

    def test_mis_nested_tags_ignored(self):
        # 0.8.1 builds on lxml.html's recovering parser: an unclosed <b>
        # and a stray </i> never change extracted TEXT, and the deeper
        # <div><p> still attaches to the winning candidate
        secs = _secs("mis_nested_tags")
        joined = " ".join(secs)
        assert "unclosed bold that spans" in joined
        assert "never opened and keeps going" in joined
        assert "Third paragraph sits a level deeper" in joined
        assert "<b>" not in joined and "</i>" not in joined

    def test_tables_in_tables_content_found(self):
        # td is a scorable ancestor in 0.8.1 (score_node handles td/pre
        # at +3); layout tables must not hide the article, while the
        # all-link nav table dies to the link-density check
        secs = _secs("tables_in_tables")
        assert any("doubly nested table cell" in s for s in secs)
        assert not any("nav a" in s for s in secs)

    def test_definition_list_lines(self):
        # html-text 0.6.2 treats dl/dt/dd as block elements: each becomes
        # its own line, in document order, inside the kept candidate
        secs = _secs("definition_list")
        assert "Term one" in secs and "Term two" in secs
        assert secs.index("Term one") < secs.index(
            "Definition one inside the article block, carrying real words.")

    def test_comments_never_surface(self):
        # lxml drops comment nodes before any scoring: markup inside
        # comments must not create candidates or text
        secs = _secs("comment_with_markup")
        joined = " ".join(secs)
        assert "commented-out markup" not in joined
        assert "inline comment" not in joined
        assert "whose comment splits no words apart" in joined

    def test_cdata_script_and_style_dropped(self):
        # 0.8.1 removes script/style subtrees wholesale (including CDATA
        # bodies) before text extraction
        secs = _secs("cdata_script")
        joined = " ".join(secs)
        assert "script paragraph" not in joined
        assert "style junk" not in joined and "color: red" not in joined

    def test_entities_decoded_broken_kept(self):
        # html entity references decode to characters (&amp; → &,
        # &#65; → A, &#x42; → B, &nbsp; → space); an unknown entity
        # stays verbatim — lxml/html5 text semantics
        secs = _secs("entity_edge_cases")
        joined = " ".join(secs)
        assert "Ampersand &" in joined and "<tag>" in joined
        assert '"quoted"' in joined and "numeric A and hex B" in joined
        assert "nbsp joined" in joined          # &nbsp; → ' '
        assert "&fakeent;" in joined            # broken entity verbatim
        assert "&amp;" not in joined

    def test_inline_svg_mathml_text_nodes_kept(self):
        # foreign elements (svg/math) are ordinary elements to the
        # recovering parser: their TEXT nodes surface (svg <text>,
        # MathML operands), their geometry does not
        secs = _secs("inline_svg_mathml")
        assert "42" in secs and "x + 1" in secs
        assert not any("M0 0L9 9" in s for s in secs)

    def test_link_farm_stripped(self):
        # 0.8.1 sanitize kills blocks whose link density outweighs text
        # (the farm is 60 links, zero prose)
        secs = _secs("link_farm")
        assert not any("spam link" in s for s in secs)
        assert any("Genuine article text" in s for s in secs)

    def test_unquoted_duplicate_attrs(self):
        # the recovering tokenizer takes the FIRST duplicate attribute
        # and accepts unquoted values; class=content still routes the
        # candidate, and extraction text is unchanged
        secs = _secs("unquoted_duplicate_attrs")
        assert any("Attribute soup on the ancestors" in s for s in secs)

    def test_truncated_document(self):
        # EOF mid-tag: the recovering parser closes every open element;
        # both paragraphs (one cut mid-word) must surface
        secs = _secs("truncated_document")
        assert any("cut off right he" in s for s in secs)


class TestScaleRobustness:
    def test_ten_megabyte_single_element_page(self):
        # one <p> holding ~10 MB of text: must parse without recursion
        # or quadratic blowup and keep the text (budgeted: seconds)
        import time
        word = "payload words with commas, and sentence shape here. "
        body = word * (10_000_000 // len(word))
        html = ("<html><head><title>Big</title></head><body>"
                f"<div class=content><p>{body}</p></div></body></html>")
        t0 = time.time()
        secs = HtmlParser.parser_txt(html)
        assert time.time() - t0 < 60
        assert secs[0] == "Big"
        assert sum(len(s) for s in secs) > 9_000_000

    def test_hundred_thousand_sibling_paragraphs(self):
        # breadth, not depth: 100k sibling <p> nodes must stay linear
        html = ("<html><head><title>Wide</title></head><body>"
                "<div class=content>"
                + "".join(f"<p>row {i} with words, commas, text.</p>"
                          for i in range(100_000))
                + "</div></body></html>")
        secs = HtmlParser.parser_txt(html)
        assert len(secs) > 50_000
