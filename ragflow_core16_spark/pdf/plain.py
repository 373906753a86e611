r"""Minimal from-scratch PDF text extraction + a deterministic PDF writer.

The reference's PlainParser uses pypdf's ``extract_text`` per page
(``deepdoc/parser/pdf_parser.py:1226-1259``).  pypdf is not available here,
so this module implements the needed subset of ISO 32000 natively:

Reader (``extract_pdf_lines``):
  * object scan (``N 0 obj … endobj``), stream payload extraction,
    FlateDecode via stdlib zlib (the only filter our corpus uses; others
    pass through raw);
  * page content streams discovered via /Type /Page → /Contents refs, in
    document page order;
  * text operators inside BT/ET: Tf (font size), Td/TD/Tm/T* (positioning),
    Tj/TJ/'/" (strings), with PDF string escapes (\\, \(, \), octal) —
    enough for machine-generated single-byte-encoded PDFs;
  * output: per-page line boxes (x0, x1, top, bottom, text, page_number)
    in reading order — the same Box shape the layout operators consume.

Writer (``build_pdf``): deterministic single-font PDF (Helvetica, one
content stream per page) used by datagen/tests — it exercises the reader's
xref-free object scan, Flate streams, and multi-page assembly.

Scale note: runs inside mapInPandas over (url, pdf binary) rows, one doc at
a time — identical partitioning story to the HTML path.
"""

from __future__ import annotations

import re
import zlib

# ---------------------------------------------------------------- writer

def build_pdf(pages: list[list[str]], compress: bool = True,
              leading: float = 16) -> bytes:
    """pages = list of pages, each a list of text lines; ``leading`` is the
    baseline-to-baseline line advance in PDF units."""
    objs: list[bytes] = []

    def ref(i):
        return f"{i} 0 R".encode()

    n_pages = len(pages)
    # object numbering: 1=catalog, 2=pages, 3..2+n=page objs, then contents,
    # then font
    font_num = 3 + 2 * n_pages
    kids = b" ".join(ref(3 + i) for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")                  # 1
    objs.append(b"<< /Type /Pages /Kids [" + kids +
                f"] /Count {n_pages} >>".encode())                     # 2
    for i in range(n_pages):                                           # 3..
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents " + ref(3 + n_pages + i) +
            b" /Resources << /Font << /F1 " + ref(font_num) + b" >> >> >>")
    for i, lines in enumerate(pages):                                  # contents
        ops = [b"BT", b"/F1 12 Tf", b"1 0 0 1 72 720 Tm"]
        first = True
        for ln in lines:
            esc = (ln.replace("\\", r"\\").replace("(", r"\(")
                     .replace(")", r"\)"))
            if not first:
                ops.append(f"0 -{leading:g} Td".encode())
            ops.append(b"(" + esc.encode("latin-1", "replace") + b") Tj")
            first = False
        ops.append(b"ET")
        payload = b"\n".join(ops)
        if compress:
            comp = zlib.compress(payload)
            objs.append(b"<< /Length " + str(len(comp)).encode() +
                        b" /Filter /FlateDecode >>\nstream\n" + comp +
                        b"\nendstream")
        else:
            objs.append(b"<< /Length " + str(len(payload)).encode() +
                        b" >>\nstream\n" + payload + b"\nendstream")
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    return _assemble(objs)


def build_pdf_positioned(pages: list[list[tuple]], compress: bool = True
                         ) -> bytes:
    """Positioned variant: pages = list of pages, each a list of
    ``(x, y, text)`` with y in PDF space (origin bottom-left).  Used to
    synthesize multi-column layouts (e.g. two-column papers) for the
    column-reorder route."""
    objs: list[bytes] = []

    def ref(i):
        return f"{i} 0 R".encode()

    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    kids = b" ".join(ref(3 + i) for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(b"<< /Type /Pages /Kids [" + kids +
                f"] /Count {n_pages} >>".encode())
    for i in range(n_pages):
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents " + ref(3 + n_pages + i) +
            b" /Resources << /Font << /F1 " + ref(font_num) + b" >> >> >>")
    for lines in pages:
        ops = [b"BT", b"/F1 12 Tf"]
        for x, y, ln in lines:
            esc = (ln.replace("\\", r"\\").replace("(", r"\(")
                     .replace(")", r"\)"))
            ops.append(f"1 0 0 1 {x:g} {y:g} Tm".encode())
            ops.append(b"(" + esc.encode("latin-1", "replace") + b") Tj")
        ops.append(b"ET")
        payload = b"\n".join(ops)
        if compress:
            comp = zlib.compress(payload)
            objs.append(b"<< /Length " + str(len(comp)).encode() +
                        b" /Filter /FlateDecode >>\nstream\n" + comp +
                        b"\nendstream")
        else:
            objs.append(b"<< /Length " + str(len(payload)).encode() +
                        b" >>\nstream\n" + payload + b"\nendstream")
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    return _assemble(objs)


def _assemble(objs: list[bytes]) -> bytes:
    out = [b"%PDF-1.4"]
    offsets = []
    pos = len(out[0]) + 1
    for i, body in enumerate(objs, start=1):
        obj = f"{i} 0 obj\n".encode() + body + b"\nendobj"
        offsets.append(pos)
        out.append(obj)
        pos += len(obj) + 1
    xref_pos = pos
    xref = [f"xref\n0 {len(objs) + 1}".encode(), b"0000000000 65535 f "]
    xref += [f"{o:010d} 00000 n ".encode() for o in offsets]
    out.append(b"\n".join(xref))
    out.append(b"trailer\n<< /Size " + str(len(objs) + 1).encode() +
               b" /Root 1 0 R >>\nstartxref\n" + str(xref_pos).encode() +
               b"\n%%EOF")
    return b"\n".join(out)


# ---------------------------------------------------------------- reader

_OBJ_START_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
# greedy: the true endstream is the LAST one (payload bytes may contain the
# literal 'endstream' run; _parse_objects re-appends the terminator exactly)
_STREAM_RE = re.compile(rb"stream\r?\n(.*)\r?\nendstream", re.S)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b")
_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")

_TOKEN = re.compile(
    rb"\((?:[^()\\]|\\.)*\)"        # literal string
    rb"|<[0-9A-Fa-f\s]*>"            # hex string
    rb"|\[|\]"
    rb"|/[A-Za-z0-9#]+"
    rb"|[-+]?[0-9]*\.?[0-9]+"
    rb"|[A-Za-z'\"*]+")


def _decode_pdf_string(raw: bytes) -> str:
    out = []
    i = 0
    body = raw[1:-1]
    while i < len(body):
        c = body[i]
        if c == 0x5C and i + 1 < len(body):  # backslash
            n = body[i + 1]
            if n in b"nrtbf":
                out.append({"n": "\n", "r": "\r", "t": "\t",
                            "b": "\b", "f": "\f"}[chr(n)])
                i += 2
            elif n in b"()\\":
                out.append(chr(n))
                i += 2
            elif 0x30 <= n <= 0x37:  # octal
                oct_digits = body[i + 1:i + 4]
                m = re.match(rb"[0-7]{1,3}", oct_digits)
                out.append(chr(int(m.group(), 8)))
                i += 1 + len(m.group())
            else:
                i += 1
        else:
            out.append(chr(c))
            i += 1
    return "".join(out)


def _parse_objects(data: bytes) -> dict[int, bytes]:
    """Binary-safe object scan: stream payloads are skipped via /Length
    (a compressed payload may contain 'endobj'/'endstream' byte runs, so a
    pure-regex scan would truncate objects — found the hard way on a real
    Flate stream)."""
    objs: dict[int, bytes] = {}
    pos = 0
    n = len(data)
    while True:
        m = _OBJ_START_RE.search(data, pos)
        if not m:
            break
        num = int(m.group(1))
        body_start = m.end()
        sm = re.compile(rb"stream\r?\n").search(data, body_start)
        em = data.find(b"endobj", body_start)
        if sm is not None and (em < 0 or sm.start() < em):
            head = data[body_start:sm.start()]
            lm = _LENGTH_RE.search(head)
            if lm:
                payload_start = sm.end()
                length = int(lm.group(1))
                payload_end = payload_start + length
            else:  # no literal Length: fall back to endstream search
                payload_start = sm.end()
                payload_end = data.find(b"endstream", payload_start)
                if payload_end < 0:
                    payload_end = n
            body = (head + b"stream\n" + data[payload_start:payload_end]
                    + b"\nendstream")
            em = data.find(b"endobj", payload_end)
            pos = (em + 6) if em >= 0 else n
        else:
            if em < 0:
                em = n
            body = data[body_start:em]
            pos = em + 6
        objs[num] = body
    return objs


def _content_stream(obj_body: bytes) -> bytes:
    m = _STREAM_RE.search(obj_body)
    if not m:
        return b""
    payload = m.group(1)
    if b"/FlateDecode" in obj_body:
        try:
            payload = zlib.decompress(payload)
        except Exception:
            pass
    return payload


def _page_content_objs(objs: dict[int, bytes]) -> list[int]:
    """Page order: via /Pages Kids when present, else object-number order."""
    pages_obj = None
    for num, body in objs.items():
        if b"/Type" in body and b"/Pages" in body and b"/Kids" in body:
            pages_obj = body
            break
    page_nums = []
    if pages_obj is not None:
        m = _KIDS_RE.search(pages_obj)
        if m:
            page_nums = [int(r.group(1)) for r in _REF_RE.finditer(m.group(1))]
    if not page_nums:
        page_nums = sorted(n for n, b in objs.items() if _PAGE_RE.search(b))
    contents = []
    for pn in page_nums:
        body = objs.get(pn, b"")
        cm = _CONTENTS_RE.search(body)
        if cm:
            contents.append(int(cm.group(1)))
    return contents


def _extract_text_ops(stream: bytes):
    """Yield (x, y, font_size, text) for every shown string."""
    x = y = 0.0
    size = 12.0
    stack: list[bytes] = []
    for tok in _TOKEN.finditer(stream):
        t = tok.group()
        if t.startswith(b"(") or t.startswith(b"<"):
            stack.append(t)
        elif t in (b"[", b"]"):
            continue
        elif t.startswith(b"/"):
            stack.append(t)
        elif re.match(rb"^[-+0-9.]", t):
            stack.append(t)
        else:  # operator
            op = t
            if op == b"Tf" and len(stack) >= 1:
                try:
                    size = float(stack[-1])
                except Exception:
                    pass
                stack.clear()
            elif op in (b"Td", b"TD") and len(stack) >= 2:
                try:
                    dx, dy = float(stack[-2]), float(stack[-1])
                    x += dx
                    y += dy
                except Exception:
                    pass
                stack.clear()
            elif op == b"Tm" and len(stack) >= 6:
                try:
                    x, y = float(stack[-2]), float(stack[-1])
                except Exception:
                    pass
                stack.clear()
            elif op == b"T*":
                y -= size * 1.2
                stack.clear()
            elif op in (b"Tj", b"'", b'"'):
                if op != b"Tj":
                    y -= size * 1.2
                strings = [s for s in stack if s.startswith(b"(")]
                for s in strings:
                    yield (x, y, size, _decode_pdf_string(s))
                stack.clear()
            elif op == b"TJ":
                strings = [s for s in stack if s.startswith(b"(")]
                text = "".join(_decode_pdf_string(s) for s in strings)
                if text:
                    yield (x, y, size, text)
                stack.clear()
            elif op == b"BT":
                x = y = 0.0
                stack.clear()
            else:
                stack.clear()


PAGE_HEIGHT = 792.0


def extract_pdf_boxes(pdf: bytes) -> list[dict]:
    """PDF bytes → reading-order line boxes (Box dicts, SURVEY.md §1.1 #3).
    top/bottom use the top-origin convention of the layout ops."""
    objs = _parse_objects(pdf)
    boxes = []
    for page_no, cobj in enumerate(_page_content_objs(objs), start=1):
        stream = _content_stream(objs.get(cobj, b""))
        for (x, y, size, text) in _extract_text_ops(stream):
            if not text.strip():
                continue
            top = PAGE_HEIGHT - y - size
            boxes.append({
                "x0": x, "x1": x + 0.5 * size * len(text),
                "top": top, "bottom": top + size,
                "text": text, "page_number": page_no,
            })
    return boxes


def extract_pdf_lines(pdf: bytes) -> list[tuple[str, str]]:
    """PlainParser-equivalent output: [(line_text, "")] in reading order
    (pdf_parser.py:1226-1259 — pypdf extract_text split to lines)."""
    boxes = extract_pdf_boxes(pdf)
    from .geometry import sort_Y_firstly
    boxes = sort_Y_firstly([dict(b) for b in boxes], 6)
    boxes.sort(key=lambda b: (b["page_number"],))
    lines = []
    for b in sorted(boxes, key=lambda b: (b["page_number"], b["top"], b["x0"])):
        lines.append((b["text"], ""))
    return lines


class PlainParser:
    """API-parity shim: __call__(binary) → (lines, tables=[])."""

    def __call__(self, binary: bytes, **kw):
        self.outlines = []
        return extract_pdf_lines(binary), []
