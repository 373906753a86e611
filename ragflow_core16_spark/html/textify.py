"""HTML → plain text with html-text-style whitespace normalization.

The reference uses ``html_text.extract_text(...)`` (html-text 0.6.2) on the
readability summary (``deepdoc/parser/html_parser.py:47``).  html-text's
public behavior, reproduced here natively:

  * script/style content dropped;
  * block-level elements separated by a single newline;
  * inline text chunks joined by a single space, except that no space is
    inserted before trailing punctuation (``.,!?;:)]"'%``) or after an
    opening bracket/quote — the "guess_punct_space" heuristic;
  * all runs of whitespace inside a text node collapse to one space;
  * leading/trailing whitespace trimmed, no blank lines.

Deterministic pure Python over our stdlib DOM; runs inside Arrow-batched UDFs.
"""

from __future__ import annotations

import re

from .dom import Node, parse_html

# html-text's newline-forcing tags (block-level, double-newline in the lib
# collapse to "\n" after RAGFlow's split("\n") + empty-drop, so a single \n
# is equivalent for section output).
BLOCK_TAGS = frozenset(
    """address article aside blockquote body br caption center col colgroup dd
    details dir div dl dt fieldset figcaption figure footer form h1 h2 h3 h4 h5
    h6 header hgroup hr html legend li main menu nav ol output p pre section
    summary table tbody td textarea tfoot th thead tr ul""".split()
)
_SKIP_TAGS = frozenset(("script", "style", "noscript", "title", "head"))

_NO_SPACE_BEFORE = set(".,!?;:)]}»›'\"%")
_NO_SPACE_AFTER = set("([{«‹\"'")
_WS = re.compile(r"\s+")


def extract_text(html: str) -> str:
    """Extract normalized text from an HTML string (html-text equivalent)."""
    if not html:
        return ""
    return extract_text_from_node(parse_html(html))


def extract_text_from_node(root: Node) -> str:
    lines: list[str] = []
    cur: list[str] = []  # inline chunks of the current line

    def flush():
        if cur:
            line = _join_inline(cur)
            if line:
                lines.append(line)
            cur.clear()

    def walk(n):
        if isinstance(n, str):
            t = _WS.sub(" ", n).strip()
            if t:
                cur.append(t)
            return
        if n.tag in _SKIP_TAGS:
            return
        is_block = n.tag in BLOCK_TAGS
        if is_block:
            flush()
        for c in n.children:
            walk(c)
        if is_block:
            flush()

    walk(root)
    flush()
    return "\n".join(lines)


def _join_inline(chunks: list[str]) -> str:
    out = chunks[0]
    for c in chunks[1:]:
        if not c:
            continue
        if out and (c[0] in _NO_SPACE_BEFORE or out[-1] in _NO_SPACE_AFTER):
            out += c
        else:
            out += " " + c
    return out.strip()
