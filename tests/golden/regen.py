#!/usr/bin/env python
"""Freeze golden outputs from the REAL pinned libraries.

This sandbox cannot install the reference's pinned extraction stack
(readability-lxml 0.8.1 / html-text 0.6.2 / chardet 5.2.0 / tiktoken —
no network), so byte-parity of the ported algorithms currently rests on
the behavior checklists in ``tests/test_html.py`` and
``tests/test_html_adversarial.py``.  THIS script closes that gap in any
connected environment:

    pip install readability-lxml==0.8.1 html-text==0.6.2 \
                chardet==5.2.0 tiktoken==0.7.0 lxml[html_clean]
    python tests/golden/regen.py

It runs the ACTUAL libraries over
  * every adversarial fixture (tests/fixtures/html/*.html),
  * the first 200 synthetic generator pages (clean + hostile branches),
  * a token-count probe corpus (cl100k_base),
and freezes the byte outputs into ``tests/golden/golden.json``.

``tests/test_golden_parity.py`` consumes the file when present,
comparing the engine's output byte-for-byte against the real libraries,
and SKIPS LOUDLY when absent.  Reference entry points being twinned:
``deepdoc/parser/html_parser.py:41-50`` (readability Document(...)
.summary(html_partial=True) → html_text.extract_text → line split) and
``rag/utils/__init__.py:77-90`` (tiktoken cl100k counting).
"""

from __future__ import annotations

import glob
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)
FIXDIR = os.path.join(REPO, "tests", "fixtures", "html")
OUT = os.path.join(HERE, "golden.json")

TOKEN_PROBES = [
    "",
    "the quick brown fox jumps over the lazy dog",
    "Document 12345 The Quick",
    "empty document body.",
    "supply demand, price index growth policy analysis.",
    "中文测试。市场对新产品的需求持续增长。",
    "From: sender-42@example.com",
    '{"doc_id": 7, "paragraphs": {"0": "data spark"}}',
    "x 123 4567 89012,.\n\nnext",
]


def reference_sections(html_bytes: bytes) -> list[str]:
    """EXACTLY the reference pipeline: deepdoc/parser/html_parser.py:41-50."""
    import chardet
    import html_text
    import readability
    cs = chardet.detect(html_bytes[:1024])["encoding"] or "utf-8"
    txt = html_bytes.decode(cs, errors="ignore")
    html_doc = readability.Document(txt)
    title = html_doc.title()
    content = html_text.extract_text(html_doc.summary(html_partial=True))
    txt = f"{title}\n{content}"
    return [s for s in txt.split("\n") if s]


def main() -> None:
    golden: dict = {"fixtures": {}, "pages": {}, "tokens": {}}

    for path in sorted(glob.glob(os.path.join(FIXDIR, "*.html"))):
        name = os.path.splitext(os.path.basename(path))[0]
        golden["fixtures"][name] = reference_sections(
            open(path, "rb").read())

    # generator pages need the driver testdata; skip silently if absent
    sf = "/root/testdata/sf0.01/documents.parquet"
    if os.path.exists(sf):
        import duckdb
        from ragflow_core16_spark.datagen.pages import (document_page,
                                                        hostile_page)
        rows = duckdb.sql(
            f"SELECT doc_id, text FROM '{sf}' ORDER BY doc_id LIMIT 200"
        ).fetchall()
        for doc_id, text in rows:
            _u, _t, clean = document_page(int(doc_id), text or "")
            _u, _t, host = hostile_page(int(doc_id), text or "")
            golden["pages"][str(doc_id)] = {
                "clean": reference_sections(clean),
                "hostile": reference_sections(host),
            }

    try:
        import tiktoken
        enc = tiktoken.get_encoding("cl100k_base")
        golden["tokens"] = {p: len(enc.encode(p)) for p in TOKEN_PROBES}
    except Exception as e:  # tiktoken needs a network fetch on first use
        print(f"tiktoken skipped: {e}", file=sys.stderr)

    json.dump(golden, open(OUT, "w"), indent=1, ensure_ascii=False)
    print(f"froze {len(golden['fixtures'])} fixtures, "
          f"{len(golden['pages'])} pages, "
          f"{len(golden['tokens'])} token probes -> {OUT}")


if __name__ == "__main__":
    main()
