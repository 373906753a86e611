"""Email (.eml) chunk template.

Reference: ``rag/app/email.py:29-107`` — MIME parse via stdlib
``email.parser.BytesParser(policy=default)``; the chunk body is assembled
from three streams:

  1. every header as a ``"Header: value"`` line (email.py:58-60),
  2. every ``text/plain`` payload, decoded with its declared charset
     (email.py:63-66),
  3. every ``text/html`` payload, decoded then boilerplate-stripped with the
     HTML parser (email.py:67-70, 79-81).

``sections = TxtParser.parser_txt("\\n".join(text_txt)) +
[(line, "") for line in HtmlParser.parser_txt("\\n".join(html_txt)) if line]``
(email.py:79-81), then ``naive_merge(sections, 128, "\\n!?。；！？")``
(email.py:84-88).  Attachments are routed to the naive template
(email.py:92-103); in the Spark pipeline attachments arrive as separate
input rows, so this template covers the message body path.
"""

from __future__ import annotations

import io
from email import policy
from email.parser import BytesParser

from .naive import naive_merge
from ..html.parser import HtmlParser
from ..parsers.txt import TxtParser


def parse_eml(binary: bytes) -> tuple[list[str], list[str]]:
    """→ (text_txt lines, html_txt payloads), reference email.py:52-77."""
    msg = BytesParser(policy=policy.default).parse(io.BytesIO(binary))
    text_txt: list[str] = []
    html_txt: list[str] = []
    for header, value in msg.items():
        text_txt.append(f"{header}: {value}")

    def _add_content(part, content_type):
        if content_type == "text/plain":
            payload = part.get_payload(decode=True)
            if payload is not None:
                text_txt.append(
                    payload.decode(part.get_content_charset() or "utf-8",
                                   errors="ignore"))
        elif content_type == "text/html":
            payload = part.get_payload(decode=True)
            if payload is not None:
                html_txt.append(
                    payload.decode(part.get_content_charset() or "utf-8",
                                   errors="ignore"))
        elif "multipart" in content_type and part.is_multipart():
            for sub in part.iter_parts():
                _add_content(sub, sub.get_content_type())

    _add_content(msg, msg.get_content_type())
    return text_txt, html_txt


def chunk_email(binary: bytes, chunk_token_num: int = 128,
                delimiter: str = "\n!?。；！？") -> list[str]:
    """eml bytes → chunk texts (reference email.py:79-88)."""
    text_txt, html_txt = parse_eml(binary)
    sections = TxtParser.parser_txt("\n".join(text_txt)) + [
        [line, ""] for line in HtmlParser.parser_txt("\n".join(html_txt))
        if line
    ]
    return [c for c in naive_merge(sections, chunk_token_num, delimiter) if c]
