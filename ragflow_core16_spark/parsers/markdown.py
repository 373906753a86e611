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


def md_render(text: str) -> str:
    """Markdown → HTML for Q&A answer bodies — native subset of what the
    reference renders via ``markdown(..., extensions=['tables'])``
    (rag/app/qa.py:434,446).  Covered blocks, emitting the python-markdown
    block shapes (tags on their own lines for lists/tables, blocks joined
    by a single newline):

      * paragraphs (blank-line separated; single newlines kept inside),
      * ATX headers (``#`` … ``######``),
      * fenced code blocks,
      * unordered (-/*/+) and ordered lists,
      * pipe tables (the ``tables`` extension shape).

    Inline emphasis/links are left verbatim — Q&A answer bodies in this
    pipeline are plain prose, and inline markup parity is documented as
    out of scope."""
    lines = text.split("\n")
    blocks: list[str] = []
    i = 0
    # strip leading/trailing blank lines (markdown lib ignores them)
    while lines and not lines[0].strip():
        lines.pop(0)
    while lines and not lines[-1].strip():
        lines.pop()

    def is_sep(ln: str) -> bool:
        return bool(re.match(r"^\s*\|?(\s*:?-+:?\s*\|)+\s*:?-+:?\s*\|?\s*$",
                             ln))

    while i < len(lines):
        ln = lines[i]
        if not ln.strip():
            i += 1
            continue
        if ln.lstrip().startswith("```"):
            j = i + 1
            while j < len(lines) and not lines[j].lstrip().startswith("```"):
                j += 1
            code = "\n".join(lines[i + 1:j])
            blocks.append(f"<pre><code>{code}\n</code></pre>")
            i = j + 1
            continue
        m = re.match(r"^(#{1,6})\s+(.*?)\s*#*\s*$", ln)
        if m:
            lvl = len(m.group(1))
            blocks.append(f"<h{lvl}>{m.group(2)}</h{lvl}>")
            i += 1
            continue
        if "|" in ln and i + 1 < len(lines) and is_sep(lines[i + 1]):
            j = i + 2
            while j < len(lines) and "|" in lines[j] and lines[j].strip():
                j += 1
            def cells(row):
                return [c.strip() for c in row.strip().strip("|").split("|")]
            out = ["<table>", "<thead>", "<tr>"]
            out += [f"<th>{h}</th>" for h in cells(ln)]
            out += ["</tr>", "</thead>", "<tbody>"]
            for row in lines[i + 2:j]:
                out.append("<tr>")
                out += [f"<td>{c}</td>" for c in cells(row)]
                out.append("</tr>")
            out += ["</tbody>", "</table>"]
            blocks.append("\n".join(out))
            i = j
            continue
        m = re.match(r"^\s*([-*+]|\d+\.)\s+(.*)$", ln)
        if m:
            ordered = m.group(1)[0].isdigit()
            items = []
            while i < len(lines):
                mm = re.match(r"^\s*(?:[-*+]|\d+\.)\s+(.*)$", lines[i])
                if not mm:
                    break
                items.append(f"<li>{mm.group(1).strip()}</li>")
                i += 1
            tag = "ol" if ordered else "ul"
            blocks.append(f"<{tag}>\n" + "\n".join(items) + f"\n</{tag}>")
            continue
        j = i
        para: list[str] = []
        while j < len(lines) and lines[j].strip() \
                and not lines[j].lstrip().startswith("```") \
                and not re.match(r"^(#{1,6})\s+", lines[j]) \
                and not re.match(r"^\s*(?:[-*+]|\d+\.)\s+", lines[j]) \
                and not ("|" in lines[j] and j + 1 < len(lines)
                         and is_sep(lines[j + 1])):
            para.append(lines[j].strip())
            j += 1
        blocks.append("<p>" + "\n".join(para) + "</p>")
        i = j
    return "\n".join(blocks)


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
