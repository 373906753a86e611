"""Chunk-template registry — the FACTORY equivalent
(``rag/svr/task_executor.py:67-84``): parser_id → template function.

Each template takes the parsed HTML *sections* (or raw decoded text for the
byte-oriented templates) and returns the list of chunk strings.  Templates
mirror the reference's per-parser_id semantics for the web-corpus formats:

  naive  — naive_merge(128, "\\n!?。；！？")          rag/app/naive.py:464-470
  book   — TOC removal → colon titles → bullet election → hierarchical
           merge(5), fallback naive_merge(256)         rag/app/book.py:129-142
  laws   — TOC removal → bullet election → hierarchical merge(5)
                                                       rag/app/laws.py:197-207
  one    — whole document = one chunk                  rag/app/one.py:125-130
  qa     — two-column / markdown-heading Q&A pairs     rag/app/qa.py:309-459
  table  — typed-column row chunks                     rag/app/table.py:130-241
  txt    — delimiter split + greedy pack               deepdoc/parser/txt_parser.py
  markdown / json — their parsers then naive_merge     rag/app/naive.py:430-447

Deterministic divergence (SURVEY.md §7.3): where the reference samples
sections via ``random_choices`` for language/bullet election
(rag/app/book.py:131-132), we elect over ALL sections — deterministic, and
identical on unambiguous inputs.
"""

from __future__ import annotations

from .hierarchy import (bullets_category, hierarchical_merge, is_english,
                        make_colon_as_title, remove_contents_table)
from .naive import naive_merge
from .qa import qa_from_csv, qa_from_markdown, qa_from_txt
from .table import parse_csv, table_chunks
from ..parsers.jsonp import JsonParser
from ..parsers.markdown import MarkdownParser
from ..parsers.txt import TxtParser


def chunk_naive(sections: list[str], chunk_token_num: int = 128,
                delimiter: str = "\n!?。；！？", **kw) -> list[str]:
    return naive_merge([(s, "") for s in sections if s],
                       chunk_token_num, delimiter)


def chunk_book(sections: list[str], lang: str = "Chinese", **kw) -> list[str]:
    secs = [(s, "") for s in sections if s]
    eng = is_english([t for t, _ in secs])
    remove_contents_table(secs, eng)
    make_colon_as_title(secs)
    bull = bullets_category([t for t, _ in secs])
    if bull >= 0:
        return ["\n".join(ck) for ck in hierarchical_merge(bull, secs, 5)]
    # fallback path strips inline position tags (book.py:135-137); HTML
    # sections carry none, so the "@" split is a no-op kept for parity
    plain = [s.split("@") for s, _ in secs]
    plain = [(p[0], "@" + p[1]) if len(p) == 2 else (p[0], "") for p in plain]
    return naive_merge(plain, kw.get("chunk_token_num", 256),
                       kw.get("delimiter", "\n。；！？"))


def chunk_laws(sections: list[str], lang: str = "Chinese", **kw) -> list[str]:
    secs = [s for s in sections if s]
    eng = lang.lower() == "english"
    remove_contents_table(secs, eng)
    secs = make_colon_as_title(secs)  # str input → passthrough (laws.py:202)
    bull = bullets_category(secs)
    return ["\n".join(ck) for ck in hierarchical_merge(bull, secs, 5)]


def chunk_one(sections: list[str], **kw) -> list[str]:
    secs = [s for s in sections if s]
    return ["\n".join(secs)] if secs else []


def chunk_qa_text(text: str, fmt: str = "txt", lang: str = "English",
                  **kw) -> list[str]:
    eng = lang.lower() == "english"
    if fmt == "csv":
        return qa_from_csv(text, eng)[0]
    if fmt in ("md", "markdown"):
        return qa_from_markdown(text, eng)
    return qa_from_txt(text, eng)[0]


def chunk_table_text(text: str, delimiter: str = "\t", **kw) -> list[str]:
    headers, rows, _fails = parse_csv(text, delimiter)
    texts, _fields, _types = table_chunks(headers, rows, delimiter)
    return texts


def chunk_txt(text: str, chunk_token_num: int = 128,
              delimiter: str = "\n!?;。；！？", **kw) -> list[str]:
    secs = TxtParser.parser_txt(text, chunk_token_num, delimiter)
    return naive_merge(secs, chunk_token_num, kw.get("merge_delimiter", "\n!?。；！？"))


def chunk_markdown(text: str, chunk_token_num: int = 128, **kw) -> list[str]:
    sections, tbls = MarkdownParser(chunk_token_num)(text=text)
    cks = naive_merge(sections, chunk_token_num, "\n!?。；！？")
    # tables become standalone chunks (tokenize_table analogue)
    return cks + [html for (_img, html), _ in tbls]


def chunk_json(text: str, chunk_token_num: int = 128, **kw) -> list[str]:
    secs = JsonParser(chunk_token_num)(text=text)
    return naive_merge([(s, "") for s in secs if s], chunk_token_num,
                       "\n!?。；！？")


def chunk_paper(sections: list[str], **kw) -> list[str]:
    from .paper import paper_merge
    return paper_merge([s for s in sections if s])


def chunk_tag_text(text: str, **kw) -> list[str]:
    from .tag import chunk_tag_txt
    return [content for content, _tags, _row in chunk_tag_txt(text)]


def chunk_email_binary(binary: bytes, chunk_token_num: int = 128, **kw) -> list[str]:
    from .email_t import chunk_email
    return chunk_email(binary, chunk_token_num)


# section-based templates (input: extracted HTML sections)
SECTION_TEMPLATES = {
    "naive": chunk_naive,
    "book": chunk_book,
    "laws": chunk_laws,
    "one": chunk_one,
    "paper": chunk_paper,
    "knowledge_graph": chunk_naive,  # aliased in the reference (task_executor.py:82)
}

# text-based templates (input: decoded document text)
TEXT_TEMPLATES = {
    "qa": chunk_qa_text,
    "table": chunk_table_text,
    "txt": chunk_txt,
    "markdown": chunk_markdown,
    "json": chunk_json,
    "tag": chunk_tag_text,
}

# binary-based templates (input: raw file bytes); the pdf modes
# ("manual"/"paper"/"presentation" DeepDOC routes) live in
# operators/pdf_extract.py over the native PDF reader
BINARY_TEMPLATES = {
    "email": chunk_email_binary,
}
