"""Markdown parser: table extraction + header-attachment sectioning.

Re-implementation of ``deepdoc/parser/markdown_parser.py:24-77`` (the three
table regex families: bordered pipe tables, borderless pipe tables, embedded
HTML tables) and the ``Markdown.__call__`` sectioner of
``rag/app/naive.py:287-312`` (long-line halving at >3× chunk budget,
``#``-header lines absorb the following line).

The reference renders extracted markdown tables to HTML via the ``markdown``
library; that library is absent here, so ``md_table_to_html`` is a native
renderer for pipe tables (same <table><tr><th/td> shape).
"""

from __future__ import annotations

import re

from ..textnorm.codec import decode_bytes
from ..textnorm.tokens import num_tokens_from_string

_BORDER_TABLE = re.compile(
    r"""
    (?:\n|^)
    (?:\|.*?\|.*?\|.*?\n)
    (?:\|(?:\s*[:-]+[-| :]*\s*)\|.*?\n)
    (?:\|.*?\|.*?\|.*?\n)+
""", re.VERBOSE)
_NO_BORDER_TABLE = re.compile(
    r"""
    (?:\n|^)
    (?:\S.*?\|.*?\n)
    (?:(?:\s*[:-]+[-| :]*\s*).*?\n)
    (?:\S.*?\|.*?\n)+
""", re.VERBOSE)
_HTML_TABLE = re.compile(
    r"""
    (?:\n|^)
    \s*
    (?:
        (?:<html[^>]*>\s*<body[^>]*>\s*<table[^>]*>.*?</table>\s*</body>\s*</html>)
        |
        (?:<body[^>]*>\s*<table[^>]*>.*?</table>\s*</body>)
        |
        (?:<table[^>]*>.*?</table>)
    )
    \s*
    (?=\n|$)
""", re.VERBOSE | re.DOTALL | re.IGNORECASE)


class MarkdownParser:
    def __init__(self, chunk_token_num: int = 128):
        self.chunk_token_num = int(chunk_token_num)

    def extract_tables_and_remainder(self, markdown_text: str):
        tables = []
        remainder = markdown_text
        if "|" in markdown_text:  # fast-path guard, same as reference
            tables.extend(_BORDER_TABLE.findall(markdown_text))
            remainder = _BORDER_TABLE.sub("", remainder)
            tables.extend(_NO_BORDER_TABLE.findall(remainder))
            remainder = _NO_BORDER_TABLE.sub("", remainder)
        if "<table>" in remainder.lower():
            tables.extend(_HTML_TABLE.findall(remainder))
            remainder = _HTML_TABLE.sub("", remainder)
        return remainder, tables

    def __call__(self, binary=None, text: str | None = None):
        """→ (sections [(text, "")], tables [((None, html), "")]) — the
        naive.py Markdown chunker shape."""
        txt = text if text is not None else decode_bytes(binary)
        remainder, tables = self.extract_tables_and_remainder(f"{txt}\n")
        sections = []
        for sec in remainder.split("\n"):
            if num_tokens_from_string(sec) > 3 * self.chunk_token_num:
                sections.append((sec[:int(len(sec) / 2)], ""))
                sections.append((sec[int(len(sec) / 2):], ""))
            else:
                if sec.strip().find("#") == 0:
                    sections.append((sec, ""))
                elif sections and sections[-1][0].strip().find("#") == 0:
                    sec_, _ = sections.pop(-1)
                    sections.append((sec_ + "\n" + sec, ""))
                else:
                    sections.append((sec, ""))
        tbls = [((None, md_table_to_html(t)), "") for t in tables]
        return sections, tbls


def md_table_to_html(md: str) -> str:
    """Render a markdown pipe table (or pass through an HTML table) to HTML."""
    md = md.strip()
    if md.lower().startswith("<"):
        return md
    lines = [ln.strip() for ln in md.splitlines() if ln.strip()]
    if len(lines) < 2:
        return f"<p>{md}</p>"

    def cells(line):
        parts = [c.strip() for c in line.strip("|").split("|")]
        return parts

    header = cells(lines[0])
    rows = [cells(ln) for ln in lines[2:]]  # line 1 is the ---|--- rule
    out = ["<table>", "<thead>", "<tr>"]
    out += [f"<th>{h}</th>" for h in header]
    out += ["</tr>", "</thead>", "<tbody>"]
    for r in rows:
        out.append("<tr>")
        out += [f"<td>{c}</td>" for c in r]
        out.append("</tr>")
    out += ["</tbody>", "</table>"]
    return "".join(out)
