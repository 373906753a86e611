"""Byte-parity against the REAL pinned libraries, when golden bytes exist.

``tests/golden/regen.py`` (run in any network-connected environment with
readability-lxml==0.8.1 / html-text==0.6.2 / chardet==5.2.0 / tiktoken)
freezes the actual libraries' outputs into ``tests/golden/golden.json``.
This suite compares the engine byte-for-byte against that file.

In THIS sandbox the file does not exist, so every test SKIPS — loudly,
by design: the skip message is the documented evidence gap (round-2
verdict, "golden bytes from the actual pinned libs"), and the regen
script is the one-command recipe that closes it.
"""

from __future__ import annotations

import json
import os

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden.json")

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN),
    reason="tests/golden/golden.json absent — run tests/golden/regen.py "
           "in a connected env (readability-lxml==0.8.1 html-text==0.6.2 "
           "chardet==5.2.0 tiktoken) to freeze real-library bytes",
)


def _golden() -> dict:
    return json.load(open(GOLDEN))


def test_fixture_sections_match_real_libraries():
    from ragflow_core16_spark.html.parser import HtmlParser
    g = _golden()["fixtures"]
    fixdir = os.path.join(os.path.dirname(__file__), "fixtures", "html")
    for name, want in g.items():
        html = open(os.path.join(fixdir, name + ".html"), "rb").read()
        got = HtmlParser.parser_txt(html.decode("utf-8"))
        assert got == want, f"fixture {name}"


def test_generator_pages_match_real_libraries():
    from ragflow_core16_spark.datagen.pages import (document_page,
                                                    hostile_page)
    from ragflow_core16_spark.html.parser import HtmlParser
    from ragflow_core16_spark.textnorm.codec import find_codec
    import duckdb
    g = _golden()["pages"]
    if not g:
        pytest.skip("golden.json carries no page section")
    rows = dict(duckdb.sql(
        "SELECT doc_id, text FROM '/root/testdata/sf0.01/documents.parquet'"
    ).fetchall())
    for doc_id_s, want in g.items():
        doc_id = int(doc_id_s)
        for kind, gen in (("clean", document_page),
                          ("hostile", hostile_page)):
            _u, _t, html = gen(doc_id, rows[doc_id] or "")
            txt = html.decode(find_codec(html), errors="ignore")
            assert HtmlParser.parser_txt(txt) == want[kind], \
                f"doc {doc_id} {kind}"


def test_token_counts_match_cl100k():
    # only meaningful when BOTH golden counts exist AND the real cl100k
    # ranks file is routed in (RAG_TIKTOKEN_VOCAB)
    g = _golden()["tokens"]
    if not g:
        pytest.skip("golden.json carries no cl100k counts")
    if not os.environ.get("RAG_TIKTOKEN_VOCAB"):
        pytest.skip("RAG_TIKTOKEN_VOCAB unset — shipped vocab is not "
                    "cl100k; set it to the real ranks file for this test")
    from ragflow_core16_spark.textnorm.tokens import num_tokens_from_string
    for probe, want in g.items():
        assert num_tokens_from_string(probe) == want, repr(probe)
