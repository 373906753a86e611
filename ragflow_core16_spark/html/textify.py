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

# 0.6.2's exact rules, expressed regex-free on this hot path:
#   ^[,:;.!?")]  →  first char in _PUNCT_CHARS (fragments are pre-stripped)
#   \s$ on raw   →  raw[-1].isspace()   (str.split's whitespace set equals
#                   \s — verified exhaustively over all codepoints, see
#                   readability._norm_text)
#   \($ on raw   →  raw.endswith("(")
_PUNCT_CHARS = frozenset(',:;.!?")')

_FLUSH = object()   # post-children sentinel for the iterative walk


def extract_text(html: str) -> str:
    """Extract normalized text from an HTML string (html-text equivalent)."""
    if not html:
        return ""
    return extract_text_from_node(parse_html(html))


def extract_text_from_node(root: Node) -> str:
    lines: list[str] = []
    cur: list[tuple[str, str]] = []  # (stripped-normalized, raw fragment)

    def flush():
        if cur:
            line = _join_inline(cur)
            if line:
                lines.append(line)
            cur.clear()

    # iterative DFS (the recursive form dominated deep fragments); _FLUSH
    # sentinel marks a block element's exit
    stack = [root]
    while stack:
        n = stack.pop()
        if n is _FLUSH:
            flush()
            continue
        if type(n) is str:
            # " ".join(split()) ≡ strip(_WS.sub(" ", n)) — downstream only
            # ever sees the stripped form (0.6.2 strips the text_content
            # before its punct rules run), so normalize pre-stripped
            t = " ".join(n.split())
            if t:
                cur.append((t, n))
            continue
        if n.tag in _SKIP_TAGS:
            continue
        if n.tag in BLOCK_TAGS:
            flush()
            stack.append(_FLUSH)
        stack.extend(reversed(n.children))
    flush()
    return "\n".join(lines)


def _join_inline(chunks: list[tuple[str, str]]) -> str:
    out = chunks[0][0]
    prev_raw = chunks[0][1]
    for stripped, raw in chunks[1:]:
        # 0.6.2 guess_punct_space: trailing whitespace on the RAW previous
        # fragment always wins; only a tight join may suppress the space.
        if not prev_raw[-1].isspace() and (
                stripped[0] in _PUNCT_CHARS or prev_raw.endswith("(")):
            out += stripped
        else:
            out += " " + stripped
        prev_raw = raw
    return out
