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


# ---------------------------------------------- tokenizer fast-path parity
@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
               max_size=300))
@settings(max_examples=150, deadline=None)
def test_tokenize_ascii_fast_path_matches_general_path(txt):
    """The pure-ascii fast path in RagTokenizer.tokenize must produce the
    same output the general (Q2B → run-split) path would."""
    from ragflow_core16_spark.textnorm.rag_tokenizer import (RagTokenizer,
                                                             _W_RE)
    tok = RagTokenizer()
    line = _W_RE.sub(" ", txt)
    if not (line.isascii() and "_" not in line):
        return
    fast = tok.tokenize(txt)
    # replicate the general path explicitly
    folded = tok._tradi2simp(tok._strQ2B(line).lower())
    res = []
    for L, zh in tok._split_by_lang(folded):
        assert not zh  # ascii input cannot yield a CJK run
        res.extend(tok._en_norm(t) for t in L.split())
    assert fast == tok.merge_(" ".join(res))


@given(st.binary(min_size=0, max_size=2048))
@settings(max_examples=120, deadline=None)
def test_xxh64_matches_block_boundaries(data):
    """Stripe-unpack rewrite must agree with the spec at every length,
    especially around the 32-byte block boundaries."""
    from ragflow_core16_spark.textnorm.xxh64 import xxh64_int
    # reference spec implementation (slice-per-lane, as originally written)
    P1 = 0x9E3779B185EBCA87; P2 = 0xC2B2AE3D27D4EB4F
    P3 = 0x165667B19E3779F9; P4 = 0x85EBCA77C2B2AE63
    P5 = 0x27D4EB2F165667C5; M = (1 << 64) - 1
    def rotl(x, r): return ((x << r) | (x >> (64 - r))) & M
    def rnd(acc, lane): return (rotl((acc + lane * P2) & M, 31) * P1) & M
    def mrg(acc, val):
        acc ^= rnd(0, val)
        return ((acc * P1) + P4) & M
    n, i = len(data), 0
    if n >= 32:
        v1, v2, v3, v4 = (P1 + P2) & M, P2, 0, (-P1) & M
        while i <= n - 32:
            v1 = rnd(v1, int.from_bytes(data[i:i+8], "little")); i += 8
            v2 = rnd(v2, int.from_bytes(data[i:i+8], "little")); i += 8
            v3 = rnd(v3, int.from_bytes(data[i:i+8], "little")); i += 8
            v4 = rnd(v4, int.from_bytes(data[i:i+8], "little")); i += 8
        h = (rotl(v1,1)+rotl(v2,7)+rotl(v3,12)+rotl(v4,18)) & M
        for v in (v1, v2, v3, v4): h = mrg(h, v)
    else:
        h = P5
    h = (h + n) & M
    while i + 8 <= n:
        h ^= rnd(0, int.from_bytes(data[i:i+8], "little"))
        h = (rotl(h, 27) * P1 + P4) & M; i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i+4], "little") * P1) & M
        h = (rotl(h, 23) * P2 + P3) & M; i += 4
    while i < n:
        h ^= (data[i] * P5) & M
        h = (rotl(h, 11) * P1) & M; i += 1
    h ^= h >> 33; h = (h * P2) & M
    h ^= h >> 29; h = (h * P3) & M
    h ^= h >> 32
    assert xxh64_int(data) == h


# ----------------------------------------- session-op invariants (pure)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               max_size=120))
@settings(max_examples=300, deadline=None)
def test_url_template_folding_idempotent(path):
    """Folding digits/hex-runs to placeholders must be a fixpoint after
    one application — a second pass can never change the template (the
    placeholders themselves contain no digit and no ≥8-hex run)."""
    import re

    def fold(p):
        return re.sub(r"[0-9]+", "{d}", re.sub(r"[0-9a-f]{8,}", "{hex}", p))

    once = fold(path)
    assert fold(once) == once


@given(st.integers(min_value=0, max_value=(1 << 64) - 1),
       st.sets(st.integers(min_value=0, max_value=63), max_size=6))
@settings(max_examples=300, deadline=None)
def test_ahash_band_pigeonhole_recall(hash_bits, flips):
    """≤6 bit flips across 8 bands of 8 bits always leave ≥1 band intact
    — the recall guarantee image_near_dup's banded join relies on."""
    other = hash_bits
    for f in flips:
        other ^= 1 << f
    bands_equal = any(
        (hash_bits >> (8 * i)) & 0xFF == (other >> (8 * i)) & 0xFF
        for i in range(8))
    assert bands_equal


@given(st.integers(min_value=-10**15, max_value=10**15),
       st.integers(min_value=1, max_value=10**6))
@settings(max_examples=300, deadline=None)
def test_sign_split_division_matches_trunc(num, den):
    """The sign-split integer division used by quality_classifier and
    tfidf scoring equals truncation toward zero — the semantics Spark's
    `div` and DuckDB's `//`-on-nonnegative both implement."""
    import math
    from fractions import Fraction
    got = num // den if num >= 0 else -((-num) // den)
    assert got == math.trunc(Fraction(num, den))
