"""Real-world HTML fixtures (tests/fixtures/html_real/): frozen-byte
regression pins for both extraction strategies on markup NOT produced by
this repo's generators — pandoc, Sphinx, R help index, difflib tables,
legal prose, and a snapshot of a real mid-2000s table-layout website.

Divergences between the strategies on these pages are real (link farms
and table grids are exactly where readability's scoring and JusText-style
density disagree) and are part of the frozen expectations — any drift in
EITHER algorithm on real markup fails here.
"""

import hashlib
import json
import os

from ragflow_core16_spark.html.density import density_sections
from ragflow_core16_spark.html.parser import HtmlParser
from ragflow_core16_spark.textnorm.codec import find_codec

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "fixtures", "html_real")
EXPECTED = json.load(open(os.path.join(HERE, "expected_extract.json")))


def _fixture_bytes():
    for name in sorted(EXPECTED):
        yield name, open(os.path.join(HERE, name), "rb").read()


class TestFrozenOutputs:
    def test_every_fixture_has_expectations(self):
        files = {n for n in os.listdir(HERE) if n.endswith(".html")}
        assert files == set(EXPECTED)

    def test_readability_outputs_frozen(self):
        for name, raw in _fixture_bytes():
            txt = raw.decode(find_codec(raw), errors="ignore")
            secs = [s for s in HtmlParser.parser_txt(txt) if s]
            joined = "\n".join(secs)
            want = EXPECTED[name]["readability"]
            assert secs[0] == want["title"], name
            assert len(secs) == want["n_sections"], name
            assert hashlib.md5(joined.encode()).hexdigest() == want["md5"], \
                name

    def test_density_outputs_frozen(self):
        for name, raw in _fixture_bytes():
            txt = raw.decode(find_codec(raw), errors="ignore")
            secs = [s for s in density_sections(txt) if s]
            joined = "\n".join(secs)
            want = EXPECTED[name]["density"]
            assert secs[0] == want["title"], name
            assert len(secs) == want["n_sections"], name
            assert hashlib.md5(joined.encode()).hexdigest() == want["md5"], \
                name

    def test_codec_choices_frozen(self):
        for name, raw in _fixture_bytes():
            assert find_codec(raw) == EXPECTED[name]["codec"], name


class TestRealMarkupBehaviors:
    def test_titles_agree_across_strategies(self):
        # both strategies read the SAME first-<title>-in-document-order
        for name in EXPECTED:
            assert (EXPECTED[name]["readability"]["title"]
                    == EXPECTED[name]["density"]["title"]), name

    def test_linkfarm_index_is_mostly_stripped_by_readability(self):
        # the R help index is ~1400 anchors: readability's link-density
        # scoring reduces it to the title; density keeps the description
        # cells (frozen divergence between the two public algorithms)
        want = EXPECTED["r_index_linkfarm.html"]
        assert want["readability"]["n_sections"] == 1
        assert want["density"]["n_sections"] > 100

    def test_real_website_iso88591_is_reference_faithful_lossy(self):
        # the game-site snapshot declares ISO-8859-1 and carries Spanish
        # accents AFTER the first KiB.  The reference's find_codec
        # (rag/nlp/__init__.py:60-71) probes ONLY blob[:1024] — an ASCII
        # head — so it picks utf-8 and decode(errors='ignore') drops the
        # accent bytes.  Byte parity means we reproduce exactly that.
        raw = open(os.path.join(
            HERE, "real_website_tables_iso88591.html"), "rb").read()
        assert find_codec(raw) == "utf-8"
        txt = raw.decode("utf-8", errors="ignore")
        assert "mx" in txt and "máx" not in txt

    def test_extract_pipeline_contains_real_pages(self):
        # the full per-row extraction UDF must yield a schema-valid 'ok'
        # row for every real page (one-bad-page containment contract)
        from ragflow_core16_spark.operators.extract import _extract_one
        for name, raw in _fixture_bytes():
            row = _extract_one(f"https://fixture/{name}", 0, raw, "en",
                               128, "\n", defer_ids=True)
            assert row["status"] == "ok", (name, row.get("error"))
            assert row["extracted_text"], name
