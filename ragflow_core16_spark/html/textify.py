"""HTML → plain text with html-text 0.6.2 whitespace normalization.

The reference uses ``html_text.extract_text(...)`` (html-text 0.6.2) on the
readability summary (``deepdoc/parser/html_parser.py:47``).  html-text's
behavior, reproduced natively (each rule pinned in
``tests/test_html.py::TestHtmlText062Whitespace``):

  * script/style content dropped;
  * block-level elements force line breaks (html-text distinguishes
    single- vs double-newline tags; the reference immediately splits on
    ``"\\n"`` — ``html_parser.py:49`` — so a single newline is
    text-equivalent and is what we emit);
  * within a line, chunks are joined by one space, using 0.6.2's
    ``guess_punct_space`` rules:
      - if the previous RAW text fragment ended with whitespace, a space
        is ALWAYS inserted;
      - otherwise the space is suppressed when the next fragment starts
        with one of ``,:;.!?")`` or the previous fragment ends with ``(``;
  * runs of whitespace inside a fragment collapse to one space;
  * no leading/trailing whitespace, no blank lines.

Deterministic pure Python over our stdlib DOM; runs inside Arrow-batched
UDFs.
"""

from __future__ import annotations

import re

from .dom import Node, parse_html

# html-text 0.6.2's EXACT newline-forcing tags (NEWLINE_TAGS ∪
# DOUBLE_NEWLINE_TAGS — the downstream split("\n") makes the single/double
# distinction moot).  Deliberately NOT a superset: html-text breaks lines
# on table/tr but joins same-row CELLS (td/th) with spaces, and section/
# address/caption/center force no break either — a wider set changes
# section boundaries (hence chunk ids) on every page with tabular markup.
BLOCK_TAGS = frozenset(
    """article aside br dd details div dt fieldset figcaption footer form
    header hr legend li main nav table tr
    blockquote dl figure h1 h2 h3 h4 h5 h6 ol p pre title ul""".split()
)
# title/head are skipped (html-text would include <title> text when fed a
# FULL document) because the pipeline runs textify on readability's
# summary fragment — headless — and emits the real title as section 0
# itself, exactly like the reference HtmlParser; skipping here only
# guards direct full-document calls against title duplication.
_SKIP_TAGS = frozenset(("script", "style", "noscript", "title", "head"))

# 0.6.2's exact rules
_PUNCT_AFTER = re.compile(r'^[,:;.!?")]')
_OPEN_BRACKET_BEFORE = re.compile(r"\($")
_TRAILING_WS = re.compile(r"\s$")
_WS = re.compile(r"\s+")


def extract_text(html: str) -> str:
    """Extract normalized text from an HTML string (html-text equivalent)."""
    if not html:
        return ""
    return extract_text_from_node(parse_html(html))


def extract_text_from_node(root: Node) -> str:
    lines: list[str] = []
    cur: list[tuple[str, str]] = []  # (normalized fragment, raw fragment)

    def flush():
        if cur:
            line = _join_inline(cur)
            if line:
                lines.append(line)
            cur.clear()

    def walk(n):
        if isinstance(n, str):
            t = _WS.sub(" ", n)
            if t.strip():
                cur.append((t, n))
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


def _join_inline(chunks: list[tuple[str, str]]) -> str:
    out = chunks[0][0].strip()
    prev_raw = chunks[0][1]
    for norm, raw in chunks[1:]:
        stripped = norm.strip()
        if not stripped:
            continue
        # 0.6.2 guess_punct_space: trailing whitespace on the RAW previous
        # fragment always wins; only a tight join may suppress the space.
        # The punct test runs on the STRIPPED fragment (0.6.2 strips the
        # text_content before _has_punct_after sees it).
        if not _TRAILING_WS.search(prev_raw) and (
                _PUNCT_AFTER.match(stripped) or
                _OPEN_BRACKET_BEFORE.search(prev_raw)):
            out += stripped
        else:
            out += " " + stripped
        prev_raw = raw
    return out.strip()
