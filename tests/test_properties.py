"""Property-based robustness tests (hypothesis): a 10^12-row job meets
every byte sequence the web can produce — parsers must never raise, and
chunkers must preserve text.

These complement the fixture tests: fixtures pin exact bytes, properties
pin invariants over arbitrary input."""

from hypothesis import given, settings, strategies as st

from ragflow_core16_spark.chunkers.naive import naive_merge_with_counts
from ragflow_core16_spark.html.parser import HtmlParser
from ragflow_core16_spark.parsers.txt import TxtParser
from ragflow_core16_spark.textnorm.codec import find_codec
from ragflow_core16_spark.textnorm.tokens import num_tokens_from_string
from ragflow_core16_spark.textnorm.xxh64 import xxh64_hexdigest


# ------------------------------------------------------------ never raise
@given(st.binary(max_size=4096))
@settings(max_examples=200, deadline=None)
def test_find_codec_total(blob):
    codec = find_codec(blob)
    assert isinstance(codec, str) and codec
    blob.decode(codec, errors="ignore")  # must be a decodable codec name


@given(st.binary(max_size=2048))
@settings(max_examples=150, deadline=None)
def test_html_parser_total_on_arbitrary_bytes(blob):
    sections = HtmlParser()(binary=blob)
    assert isinstance(sections, list)
    assert all(isinstance(s, str) for s in sections)


@given(st.text(max_size=2048))
@settings(max_examples=150, deadline=None)
def test_html_parser_total_on_arbitrary_text(txt):
    assert isinstance(HtmlParser.parser_txt(txt), list)


# --------------------------------------------------------- text preserved
@given(st.lists(st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
                        min_size=1, max_size=120),
                min_size=0, max_size=30),
       st.integers(min_value=1, max_value=256))
@settings(max_examples=150, deadline=None)
def test_naive_merge_preserves_all_text(sections, budget):
    """Concatenation of chunks == concatenation of sections (the packer
    moves boundaries, never bytes) and counts align 1:1 with chunks."""
    cks, tknums = naive_merge_with_counts(
        [(s, "") for s in sections], budget, "\n!?。；！？")
    assert "".join(cks) == "".join(sections)
    assert len(cks) == len(tknums)


@given(st.text(min_size=0, max_size=1024),
       st.integers(min_value=1, max_value=128))
@settings(max_examples=100, deadline=None)
def test_txt_parser_preserves_non_delimiter_text(txt, budget):
    secs = TxtParser.parser_txt(txt, budget, "\n!?;。；！？")
    joined = "".join(c for c, _ in secs)
    stripped = txt
    for d in "\n!?;。；！？":
        stripped = stripped.replace(d, "")
    assert joined == stripped


# ------------------------------------------------------------ determinism
@given(st.text(max_size=512))
@settings(max_examples=100, deadline=None)
def test_token_count_deterministic_and_nonneg(txt):
    a = num_tokens_from_string(txt)
    assert a == num_tokens_from_string(txt)
    assert a >= 0
    if txt.strip():
        assert a > 0


@given(st.text(max_size=256))
@settings(max_examples=100, deadline=None)
def test_xxh64_hex_stable(txt):
    h = xxh64_hexdigest(txt)
    assert h == xxh64_hexdigest(txt)
    assert len(h) == 16 and int(h, 16) >= 0
