"""Unit tests for the native DOM / readability / textify / HtmlParser stack."""

from ragflow_core16_spark.html.dom import parse_html
from ragflow_core16_spark.html.readability import Document
from ragflow_core16_spark.html.textify import extract_text
from ragflow_core16_spark.html.parser import HtmlParser, html_sections

ARTICLE = """<html><head><title>Test Article Title</title></head><body>
<div class="nav"><a href="/">Home</a> <a href="/a">About</a> <a href="/b">News</a>
 <a href="/c">Contact</a> <a href="/d">More</a> <a href="/e">Stuff</a>
 <a href="/f">Links</a> <a href="/g">Other</a></div>
<div class="ad">Buy now! <a href="/buy">cheap deals</a> <a href="/x">click</a></div>
<div class="content">
<p>This is the first paragraph of the main article, it has plenty of text,
several commas, and should definitely be kept by the extractor as content.</p>
<p>Second paragraph continues the story with more detail, more words, and
more commas, giving it a high readability score overall.</p>
<p>Third paragraph wraps things up nicely, concluding the article.</p>
</div>
<div class="footer">Copyright 2024 <a href="/p">Privacy</a> <a href="/t">Terms</a></div>
</body></html>"""


class TestDom:
    def test_basic_tree(self):
        root = parse_html("<div><p>a</p><p>b</p></div>")
        assert [n.tag for n in root.find_all("p")] == ["p", "p"]

    def test_implicit_p_close(self):
        root = parse_html("<p>one<p>two<p>three")
        ps = root.find_all("p")
        assert len(ps) == 3
        assert ps[0].text_content() == "one"

    def test_implicit_li_close(self):
        root = parse_html("<ul><li>a<li>b<li>c</ul>")
        assert len(root.find_all("li")) == 3

    def test_table_implicit_close(self):
        root = parse_html("<table><tr><td>a<td>b<tr><td>c</table>")
        assert len(root.find_all("tr")) == 2
        assert len(root.find_all("td")) == 3

    def test_stray_end_tags_ignored(self):
        root = parse_html("<div>text</p></span></div>")
        assert root.find("div").text_content() == "text"

    def test_void_elements(self):
        root = parse_html("<p>a<br>b<img src='x'>c</p>")
        assert root.find("p").text_content() == "abc"

    def test_attrs(self):
        root = parse_html('<div class="main" id="x">t</div>')
        d = root.find("div")
        assert d.get("class") == "main" and d.get("id") == "x"

    def test_never_raises(self):
        for bad in ["<", "<<>>", "<a href=", "</" , "<p " + "x" * 100]:
            parse_html(bad)

    def test_deep_nesting_no_recursion_error(self):
        # adversarial pages: depth is capped, text survives, no RecursionError
        deep = "<div>" * 5000 + "deeply nested text" + "</div>" * 5000
        from ragflow_core16_spark.html.parser import html_sections
        secs = html_sections(deep.encode())
        assert any("deeply nested text" in s for s in secs)


class TestReadability:
    def test_title(self):
        assert Document(ARTICLE).title() == "Test Article Title"

    def test_no_title(self):
        assert Document("<p>hi</p>").title() == "[no-title]"

    def test_strips_boilerplate(self):
        summary = Document(ARTICLE).summary(html_partial=True)
        assert "first paragraph" in summary
        assert "Home" not in summary          # nav stripped
        assert "cheap deals" not in summary   # ad stripped
        assert "Copyright" not in summary     # footer stripped

    def test_keeps_all_article_paragraphs(self):
        summary = Document(ARTICLE).summary(html_partial=True)
        for frag in ("first paragraph", "Second paragraph", "Third paragraph"):
            assert frag in summary

    def test_script_style_removed(self):
        html = ARTICLE.replace("</body>", "<script>var x=1;</script><style>p{}</style></body>")
        summary = Document(html).summary()
        assert "var x" not in summary and "p{}" not in summary


class TestTextify:
    def test_blocks_to_newlines(self):
        assert extract_text("<p>a</p><p>b</p>") == "a\nb"

    def test_inline_space_join(self):
        assert extract_text("<p><b>bold</b> and <i>italic</i></p>") == "bold and italic"

    def test_punct_no_space(self):
        assert extract_text("<p>Hello<b>,</b> world<span>.</span></p>") == "Hello, world."

    def test_whitespace_collapse(self):
        assert extract_text("<p>a   \n\t  b</p>") == "a b"

    def test_br_breaks_line(self):
        assert extract_text("<p>a<br>b</p>") == "a\nb"

    def test_table_rows_are_lines_cells_joined(self):
        """html-text 0.6.2: table/tr force newlines but td/th do NOT —
        same-row cells join with a space (the 0.6.2 NEWLINE_TAGS set;
        a td/th superset would shift section boundaries and chunk ids
        on every page with tabular markup)."""
        out = extract_text(
            "<table><tr><td>x</td><td>y</td></tr>"
            "<tr><td>u</td><td>v</td></tr></table>")
        assert out.split("\n") == ["x y", "u v"]

    def test_section_and_caption_do_not_break_lines(self):
        # neither tag is in html-text 0.6.2's newline sets (inside a div:
        # a <p> would auto-close at <section> per HTML5 parsing and the
        # p's own newline would mask the property)
        assert extract_text("<div>a<section>b</section>c</div>") == "a b c"
        assert extract_text(
            "<table><caption>t</caption><tr><td>x</td></tr></table>"
        ) == "t\nx"


class TestHtmlParser:
    def test_sections_title_first(self):
        secs = html_sections(ARTICLE.encode("utf-8"))
        assert secs[0] == "Test Article Title"
        assert any("first paragraph" in s for s in secs)

    def test_empty_sections_dropped(self):
        assert all(s for s in html_sections(ARTICLE.encode("utf-8")))

    def test_gbk_encoded(self):
        html = ("<html><head><title>标题</title></head><body><div class='content'>"
                "<p>这是正文第一段，包含足够多的中文字符，并且有标点符号，应当被提取。</p>"
                "<p>第二段继续说明问题，提供更多细节，让抽取器有足够文本密度评分。</p>"
                "</div></body></html>")
        secs = html_sections(html.encode("gbk"))
        assert secs[0] == "标题"
        assert any("这是正文第一段" in s for s in secs)

    def test_parser_txt_type_error(self):
        import pytest
        with pytest.raises(TypeError):
            HtmlParser.parser_txt(b"bytes not str")

    def test_malformed_does_not_crash(self):
        secs = html_sections(b"<p>decent length paragraph of plain text with commas, enough to score.</p><div></p>")
        assert isinstance(secs, list)

    def test_deterministic(self):
        a = html_sections(ARTICLE.encode("utf-8"))
        b = html_sections(ARTICLE.encode("utf-8"))
        assert a == b


class TestReadability081Checklist:
    """Each test pins one readability-lxml 0.8.1 behavior (the checklist in
    html/readability.py's docstring).  Fixtures are adversarial: they fail
    if the implementation drifts toward generic Arc90."""

    BODY = ("Alpha beta gamma delta epsilon zeta eta theta, iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi.")

    def _doc(self, inner):
        from ragflow_core16_spark.html.readability import Document
        return Document(f"<html><head><title>T</title></head>"
                        f"<body>{inner}</body></html>")

    def test_exact_unlikely_set_no_additions(self):
        # 'nav'/'advert' are NOT in 0.8.1's unlikelyCandidatesRe — such
        # nodes SURVIVE the unlikely pass (they can still lose on score);
        # 'sidebar' IS in the set and is removed outright
        from ragflow_core16_spark.html.dom import parse_html
        from ragflow_core16_spark.html.readability import Document
        html = (f'<html><body><div class="nav"><p>nav words.</p></div>'
                f'<div class="sidebar"><p>side words.</p></div>'
                f'<div class="advert"><p>ad words.</p></div></body></html>')
        d = Document(html)
        root = parse_html(html)
        d._remove_unlikely(root)
        txt = root.text_content()
        assert "nav words" in txt and "ad words" in txt
        assert "side words" not in txt

    def test_ok_maybe_overrides_unlikely(self):
        # 'sidebar article' matches okMaybeItsACandidateRe ('article') →
        # the node is NOT removed by the unlikely pass
        html = (f'<div class="sidebar article"><p>{self.BODY}</p>'
                f'<p>{self.BODY} ok maybe kept.</p></div>')
        assert "ok maybe kept" in self._doc(html).summary()

    def test_html_body_exempt_from_unlikely(self):
        from ragflow_core16_spark.html.readability import Document
        html = (f'<html><body class="comment"><div id="m">'
                f'<p>{self.BODY}</p><p>{self.BODY}</p></div></body></html>')
        out = Document(html).summary()
        assert "Alpha beta" in out

    def test_div_with_deep_block_descendant_stays_div(self):
        # 0.8.1 searches the SERIALIZED subtree: a <p> nested under a
        # <span> still keeps the outer div a div
        from ragflow_core16_spark.html.dom import parse_html
        from ragflow_core16_spark.html.readability import Document
        d = Document("<html><body><div id='x'><span><p>t</p></span></div>"
                     "</body></html>")
        root = parse_html(d._raw)
        d._divs_to_paragraphs(root)
        tags = {n.get("id"): n.tag for n in root.iter() if n.get("id")}
        assert tags["x"] == "div"

    def test_div_with_only_inline_children_becomes_p(self):
        from ragflow_core16_spark.html.dom import parse_html
        from ragflow_core16_spark.html.readability import Document
        d = Document("<html><body><div id='x'><span>t</span> tail</div>"
                     "</body></html>")
        root = parse_html(d._raw)
        d._divs_to_paragraphs(root)
        tags = {n.get("id"): n.tag for n in root.iter() if n.get("id")}
        assert tags["x"] == "p"

    def test_stray_div_text_wrapped_and_br_dropped(self):
        from ragflow_core16_spark.html.dom import parse_html
        from ragflow_core16_spark.html.readability import Document
        d = Document("<html><body><div id='x'>stray text<br><p>para</p>"
                     "</div></body></html>")
        root = parse_html(d._raw)
        d._divs_to_paragraphs(root)
        x = next(n for n in root.iter() if n.get("id") == "x")
        kinds = [(c.tag if not isinstance(c, str) else "#text")
                 for c in x.children]
        assert "br" not in kinds
        assert kinds[0] == "p"          # stray text now wrapped
        assert x.children[0].text_content() == "stray text"

    def test_score_base_is_split_pieces(self):
        # 1 + len(split(',')) + min(len/100, 3): a comma-less 25+3·k-char
        # paragraph scores 2 + len/100 — NOT 1 + len/100
        from ragflow_core16_spark.html.dom import parse_html
        from ragflow_core16_spark.html.readability import Document
        text = "x" * 50
        d = Document(f"<html><body><div id='par'><p>{text}</p></div>"
                     "</body></html>")
        root = parse_html(d._raw)
        d._divs_to_paragraphs(root)
        cands = d._score_paragraphs(root)
        par = next(n for n in cands if n.get("id") == "par")
        # div prior +5, paragraph 1 + 1 piece + 0.5 = 2.5, no links
        assert abs(cands[par] - 7.5) < 1e-9
        # two commas → 3 pieces: 1 + 3 + 0.5 = 4.5 (+5 prior)
        d2 = Document(f"<html><body><div id='par'><p>{'y'*24},{'y'*13},"
                      f"{'y'*11}</p></div></body></html>")
        root2 = parse_html(d2._raw)
        d2._divs_to_paragraphs(root2)
        cands2 = d2._score_paragraphs(root2)
        par2 = next(n for n in cands2 if n.get("id") == "par")
        assert abs(cands2[par2] - 9.5) < 1e-9

    def test_sibling_threshold_max_10_or_fifth(self):
        from ragflow_core16_spark.html.dom import parse_html
        from ragflow_core16_spark.html.readability import Document
        d = Document("<html><body><div></div></body></html>")
        root = parse_html(d._raw)
        best = root.find("div")
        # weak sibling div (score 9.9 < max(10, 0.2·20)) excluded;
        # sibling at 10.1 included
        from ragflow_core16_spark.html.dom import Node
        weak, strong = Node("div", {"id": "w"}), Node("div", {"id": "s"})
        body = root.find("body")
        body.append(weak)
        body.append(strong)
        art = d._join_siblings(best, 20.0, {weak: 9.9, strong: 10.1})
        ids = [c.get("id") for c in art.children if not isinstance(c, str)]
        assert "s" in ids and "w" not in ids

    def test_sibling_p_rule_uses_leading_text(self):
        # a sibling <p> whose 100 chars all sit inside a <b> child has
        # EMPTY leading text in 0.8.1 (lxml .text) → not appended
        from ragflow_core16_spark.html.dom import parse_html
        from ragflow_core16_spark.html.readability import Document
        long = "z" * 100
        html = (f"<html><body><div id='m'><p>{self.BODY}</p>"
                f"<p>{self.BODY}</p></div>"
                f"<p id='wrapped'><b>{long}</b></p>"
                f"<p id='plain'>{long}</p></body></html>")
        out = self._doc.__func__  # silence lint; use Document directly
        doc = Document(html)
        summary = doc.summary()
        assert "z" * 100 in summary          # plain sibling appended
        assert "<b>" not in summary          # wrapped sibling was not

    def test_html_partial_wraps_in_bare_div(self):
        html = f'<div id="m"><p>{self.BODY}</p><p>{self.BODY}</p></div>'
        out = self._doc(html).summary(html_partial=True)
        assert out.startswith("<div>")
        assert "<body" not in out and "<html" not in out

    def test_sanitize_negative_header_removed(self):
        html = (f'<div id="m"><h2 class="widget">Promo header</h2>'
                f'<p>{self.BODY}</p><p>{self.BODY}</p></div>')
        out = self._doc(html).summary()
        assert "Promo header" not in out

    def test_sanitize_link_farm_ul_removed(self):
        links = "".join(f'<li><a href="/{i}">link text {i}</a></li>'
                        for i in range(8))
        html = (f'<div id="m"><p>{self.BODY}</p><p>{self.BODY}</p>'
                f'<ul>{links}</ul></div>')
        out = self._doc(html).summary()
        assert "link text 3" not in out


class TestHtmlText062Whitespace:
    """html-text 0.6.2 guess_punct_space rules, each pinned (textify.py)."""

    def _t(self, html):
        from ragflow_core16_spark.html.textify import extract_text
        return extract_text(html)

    def test_tight_punct_join(self):
        # no whitespace in the source between 'foo' and '.' → glued; the
        # fragment AFTER the punct still gets a space (it neither starts
        # with punct nor follows '(')
        assert self._t("<p>foo<b>.</b>continues</p>") == "foo. continues"
        assert self._t("<p>foo<b>.</b></p>") == "foo."

    def test_raw_trailing_whitespace_always_spaces(self):
        # source whitespace before the punct fragment survives as a space
        assert self._t("<p>foo <b>.</b></p>") == "foo ."

    def test_open_bracket_glues_forward(self):
        assert self._t("<p>see(<b>note</b>) here</p>") == "see(note) here"

    def test_punct_set_is_exact_062(self):
        # '%' and ']' are NOT in 0.6.2's punct-after set → spaced
        assert self._t("<p>50<b>%</b></p>") == "50 %"
        assert self._t("<p>a<b>]</b></p>") == "a ]"
        # ')' IS in the set
        assert self._t("<p>a<b>)</b></p>") == "a)"

    def test_inline_whitespace_collapses(self):
        assert self._t("<p>a\n\t  b</p>") == "a b"

    def test_blocks_become_lines(self):
        assert self._t("<div>a</div><div>b</div>") == "a\nb"
        assert self._t("<p>a<br>b</p>") == "a\nb"

    def test_nested_table_cells_line_split(self):
        out = self._t("<table><tr><td>c1</td><td><table><tr><td>n1</td>"
                      "</tr></table></td></tr></table>")
        assert out.split("\n") == ["c1", "n1"]

    def test_definition_list(self):
        out = self._t("<dl><dt>term</dt><dd>def one</dd></dl>")
        assert out.split("\n") == ["term", "def one"]

    def test_nbsp_and_entities(self):
        # &nbsp; is whitespace after entity decode; &amp; is a literal
        assert self._t("<p>a&nbsp;b &amp; c</p>") == "a b & c"

    def test_skip_script_style(self):
        assert self._t("<p>keep</p><script>var x=1;</script>"
                       "<style>p{}</style>") == "keep"


class TestSanitizeUsesRealScores:
    def test_negatively_classed_candidate_survives(self):
        # regression (r2 review): _sanitize must see the candidate's real
        # content score (0.8.1 computes weight + content_score); a
        # class="media" main div with heavily scored paragraphs stays
        from ragflow_core16_spark.html.readability import Document
        para = ("Alpha beta gamma delta epsilon zeta eta theta, iota kappa "
                "lambda mu nu xi omicron pi rho sigma tau upsilon, phi chi "
                "psi omega again and again and again and onward we go now.")
        html = ('<html><body><div class="media">' +
                "".join(f"<p>{para}</p>" for _ in range(8)) +
                "</div></body></html>")
        out = Document(html).summary()
        assert "Alpha beta gamma" in out


class TestFormHandling:
    """readability 0.8.1: forms survive scoring (Cleaner(forms=False)),
    form/textarea trees drop at the START of sanitize, and bare inputs
    outside forms feed the input-density conditional-cleanup rule."""

    def test_input_density_rule_fires(self):
        # a div with one short paragraph and 6 bare inputs: 6 > 1/3 → the
        # container is form-like and must be removed (this rule was dead
        # while inputs were stripped before scoring)
        html = ("<html><body><div class='content'>"
                "<p>" + "Real article text with plenty of words here. " * 6
                + "</p></div>"
                "<div><p>sign up</p>" + "<input type='text'>" * 6
                + "</div></body></html>")
        secs = html_sections(html.encode())
        assert not any("sign up" in s for s in secs)
        assert any("Real article text" in s for s in secs)

    def test_form_text_never_reaches_output(self):
        html = ("<html><body><div class='content'>"
                "<p>" + "Body words repeated for scoring mass here. " * 6
                + "</p><form><p>newsletter email box</p></form>"
                "</div></body></html>")
        secs = html_sections(html.encode())
        assert not any("newsletter" in s for s in secs)


def test_parser_accepts_str_positionally():
    from ragflow_core16_spark.html.parser import HtmlParser
    secs = HtmlParser()("<html><head><title>T</title></head><body>"
                        "<div><p>some body text here</p></div></body></html>")
    assert secs and secs[0] == "T"


def test_is_chinese_query_tolerates_empty_tokens():
    from ragflow_core16_spark.textnorm.query import FulltextQueryer
    assert FulltextQueryer.is_chinese_query(" a b c d") is not None
    assert FulltextQueryer.is_chinese_query("中文 查询 词语  测试 ")


class TestFastParserDifferential:
    """The fast batch tokenizer (dom.py::_fast_parse) must produce a tree
    IDENTICAL to the stdlib-HTMLParser builder on: every adversarial
    fixture, generator pages from both branches, and two fixed-seed
    malformed-snippet fuzz corpora (14k strings covering unterminated
    constructs, bogus end tags, marked sections, entity edge cases,
    attribute soup, cdata modes).  Any fidelity change in either parser
    breaks this suite before it can touch extraction output."""

    @staticmethod
    def _ser(n, out):
        if isinstance(n, str):
            out.append(("T", n))
            return
        out.append(("N", n.tag, tuple(sorted(n.attrs.items()))))
        for c in n.children:
            TestFastParserDifferential._ser(c, out)
        out.append(("E", n.tag))

    @classmethod
    def _same(cls, text):
        from ragflow_core16_spark.html.dom import (_fast_parse,
                                                   parse_html_stdlib)
        a, b = [], []
        cls._ser(_fast_parse(text), a)
        cls._ser(parse_html_stdlib(text), b)
        return a == b

    def test_fixtures_identical(self):
        import glob
        import os
        fixdir = os.path.join(os.path.dirname(__file__), "fixtures", "html")
        for p in glob.glob(os.path.join(fixdir, "*.html")):
            assert self._same(open(p).read()), p

    def test_generator_pages_identical(self):
        import duckdb
        from ragflow_core16_spark.datagen.pages import (document_page,
                                                        generate_page,
                                                        hostile_page)
        from ragflow_core16_spark.textnorm.codec import find_codec
        rows = duckdb.sql(
            "SELECT doc_id, text FROM "
            "'/root/testdata/sf0.001/documents.parquet'").fetchall()
        for d, t in rows:
            for gen in (document_page, hostile_page):
                h = gen(int(d), t or "")[2]
                assert self._same(h.decode(find_codec(h),
                                           errors="ignore")), (d, gen)
        for d in range(100):
            h = generate_page(d)[2]
            assert self._same(h.decode(find_codec(h), errors="ignore")), d

    def test_malformed_fuzz_identical(self):
        import random
        rng = random.Random(7)
        a1 = (list("<>/=\"' abcdefp!?-&;#x123")
              + ["<p", "</p>", "<div", "class=", "<!--", "-->",
                 "<script>", "</script>", "&amp;", "&#65;", "&fake;",
                 "<![CDATA[", "]]>", "<?pi?>", "<!doctype html>",
                 "<a href=", "<br/>", "</>", "< ", "<3"])
        for _ in range(3000):
            s = "".join(rng.choice(a1) for _ in range(rng.randint(1, 60)))
            assert self._same(s), repr(s)
        rng = random.Random(99)
        a2 = (list("<>/=\"' abcdefp!?-&;#x123\n\t中文é")
              + ["<p>", "</p>", "<div class='x y'>", "<span id=z>",
                 "<table><tr><td>", "</td></tr></table>", "<li>", "<ul>",
                 "<!---->", "<!-- x -->",
                 "<script type='text/javascript'>", "</script>",
                 "<style>", "</style>", "&amp;", "&#65;", "&#x42;",
                 "&nbsp;", "&fake;", "&", ";", "<![CDATA[", "]]>",
                 "<?xml version='1.0'?>", "<!DOCTYPE html>",
                 "<a href='/x?a=1&amp;b=2'>", "<img src=x.png/>", "<br>",
                 "<hr/>", "<input type=text value='a b'>",
                 "<meta charset=utf-8>", "word another", "<b><i>",
                 "</i></b>", "<p align=left align=right>"])
        for _ in range(3000):
            s = "".join(rng.choice(a2) for _ in range(rng.randint(1, 80)))
            assert self._same(s), repr(s)

    def test_env_forces_stdlib(self, monkeypatch):
        from ragflow_core16_spark.html import dom
        calls = []
        orig = dom.parse_html_stdlib
        monkeypatch.setattr(dom, "parse_html_stdlib",
                            lambda t: calls.append(1) or orig(t))
        monkeypatch.setenv("RAG_HTML_PARSER", "stdlib")
        dom.parse_html("<p>x</p>")
        assert calls
