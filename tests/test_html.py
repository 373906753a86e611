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

    def test_table_cells_are_lines(self):
        out = extract_text("<table><tr><td>x</td><td>y</td></tr></table>")
        assert out.split("\n") == ["x", "y"]


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
