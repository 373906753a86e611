"""HTML page → sections, mirroring the reference's RAGFlowHtmlParser.

Reference: ``deepdoc/parser/html_parser.py:30-50`` —

    encoding = find_codec(binary); txt = binary.decode(encoding, "ignore")
    doc = readability.Document(txt)
    txt = f"{doc.title()}\\n{html_text.extract_text(doc.summary(html_partial=True))}"
    sections = txt.split("\\n")

and the naive-chunker HTML route drops empty sections and tags them ""
(``rag/app/naive.py:437-439``).  All three stages here are our native
implementations (codec brute-force, Arc90 scoring, html-text normalization).
"""

from __future__ import annotations

from ..textnorm.codec import find_codec
from .readability import Document
from .textify import extract_text, extract_text_from_node


class HtmlParser:
    """Callable parser: bytes (or str) → list[str] sections."""

    def __call__(self, binary=None, text: str | None = None) -> list[str]:
        if text is None:
            if binary is None:
                return []
            if isinstance(binary, str):
                # already-decoded HTML passed positionally — the docstring
                # allows it; without this, find_codec wastes a 100-codec
                # pass and str.decode then raises AttributeError
                text = binary
            else:
                encoding = find_codec(binary)
                text = binary.decode(encoding, errors="ignore")
        return self.parser_txt(text)

    @classmethod
    def parser_txt(cls, txt: str) -> list[str]:
        if not isinstance(txt, str):
            raise TypeError("txt type should be str!")
        doc = Document(txt)
        # fast path: one DOM parse total — summary_node() caches the title
        # from its own parse, and text is extracted node-level (no
        # serialize→re-parse round trip). Output is byte-identical to the
        # string-path (regression-checked by the bench output hash).
        article = doc.summary_node()
        content = extract_text_from_node(article)
        title = doc.title()
        combined = f"{title}\n{content}"
        return combined.split("\n")


def html_sections(binary: bytes) -> list[str]:
    """Reference naive.py HTML route: parse, drop empties
    (rag/app/naive.py:437-439)."""
    return [s for s in HtmlParser()(binary) if s]
