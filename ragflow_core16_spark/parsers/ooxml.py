"""Native OOXML (docx / xlsx / pptx) parsing — zip + XML, no external libs.

The reference drives these formats through python-docx / openpyxl / python-pptx
(``deepdoc/parser/docx_parser.py``, ``excel_parser.py``, ``ppt_parser.py``).
OOXML is a zip of XML parts, so the Spark engine reads them natively with
``zipfile`` + ``xml.etree`` inside Arrow-batched UDFs — no per-executor
binary-dependency shipping.  Semantics preserved per parser:

  * docx (``docx_parser.py:117-140``): paragraphs → (concat of run texts,
    resolved style display name); page counter advances on
    ``<w:lastRenderedPageBreak/>``; empty paragraphs keep their (""‚ style)
    slot; tables → header-aware "h: v" line composition
    (``__compose_table_content``, docx_parser.py:33-115).
  * xlsx (``excel_parser.py:106-128``): per sheet, row 0 is the header row;
    each data row becomes "header：value; …" (fullwidth colon), with
    " ——sheetname" appended when the sheet name isn't "Sheet*"; and the
    ``html()`` mode (excel_parser.py:73-104) emits <table> chunks of ≤256
    rows with a <caption>.
  * pptx (``ppt_parser.py:23-77``): per slide, shapes sorted by
    (top // 10, left); text frames → paragraphs with bullet rendering
    ``"  "*level + "." + text``; tables → "header: cell; …" per data row;
    group shapes recurse; slide text = newline-join.

Writers (``build_docx``/``build_xlsx``/``build_pptx``) emit minimal valid
packages for deterministic test/bench corpora.
"""

from __future__ import annotations

import io
import re
import zipfile
from collections import Counter
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

# ---------------------------------------------------------------------------
# docx
# ---------------------------------------------------------------------------

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def _docx_style_names(zf: zipfile.ZipFile) -> dict[str, str]:
    """styleId → display name (word/styles.xml), python-docx resolves
    ``p.style.name`` the same way."""
    try:
        root = ET.fromstring(zf.read("word/styles.xml"))
    except KeyError:
        return {}
    names = {}
    for st in root.iter(f"{_W}style"):
        sid = st.get(f"{_W}styleId")
        nm = st.find(f"{_W}name")
        if sid and nm is not None:
            names[sid] = nm.get(f"{_W}val", sid)
    return names


def _para_text_and_break(p) -> tuple[str, int]:
    """Concatenate run texts; count lastRenderedPageBreak occurrences
    (docx_parser.py:124-136)."""
    texts, breaks = [], 0
    for r in p.iter(f"{_W}r"):
        for el in r:
            tag = el.tag
            if tag == f"{_W}t":
                texts.append(el.text or "")
            elif tag == f"{_W}lastRenderedPageBreak":
                breaks += 1
            elif tag == f"{_W}tab":
                texts.append("\t")
            elif tag == f"{_W}br":
                texts.append("\n")
    return "".join(texts), breaks


def docx_paragraphs(binary: bytes, from_page: int = 0,
                    to_page: int = 100000000) -> list[tuple[str, str]]:
    """→ [(paragraph text, style display name)] (docx_parser.py:117-137):
    text kept only inside [from_page, to_page); every paragraph keeps its
    slot (empty text otherwise)."""
    with zipfile.ZipFile(io.BytesIO(binary)) as zf:
        styles = _docx_style_names(zf)
        root = ET.fromstring(zf.read("word/document.xml"))
    body = root.find(f"{_W}body")
    secs = []
    pn = 0
    if body is None:
        return secs
    # direct children only: python-docx document.paragraphs excludes
    # paragraphs nested inside table cells
    for p in body.findall(f"{_W}p"):
        if pn > to_page:
            break
        full_text, _ = _para_text_and_break(p)
        # run-level page accounting (docx_parser.py:124-136): each run's
        # text is kept when its page is in range, THEN the run's
        # lastRenderedPageBreak (at most one counted) advances the page
        kept_runs = []
        for r in p.iter(f"{_W}r"):
            if pn > to_page:
                break
            run_text = []
            has_break = False
            for el in r:
                if el.tag == f"{_W}t":
                    run_text.append(el.text or "")
                elif el.tag == f"{_W}lastRenderedPageBreak":
                    has_break = True
                elif el.tag == f"{_W}tab":
                    run_text.append("\t")
                elif el.tag == f"{_W}br":
                    run_text.append("\n")
            if from_page <= pn < to_page and full_text.strip():
                kept_runs.append("".join(run_text))
            if has_break:
                pn += 1
        keep = "".join(kept_runs)
        style = "Normal"
        ppr = p.find(f"{_W}pPr")
        if ppr is not None:
            pstyle = ppr.find(f"{_W}pStyle")
            if pstyle is not None:
                sid = pstyle.get(f"{_W}val", "")
                style = styles.get(sid, sid)
        secs.append((keep, style))
    return secs


def docx_table_grids(binary: bytes) -> list[list[list[str]]]:
    """→ one grid (rows × cells of text) per <w:tbl>."""
    with zipfile.ZipFile(io.BytesIO(binary)) as zf:
        root = ET.fromstring(zf.read("word/document.xml"))
    grids = []
    for tbl in root.iter(f"{_W}tbl"):
        grid = []
        for tr in tbl.findall(f"{_W}tr"):
            row = []
            for tc in tr.findall(f"{_W}tc"):
                row.append("\n".join(
                    _para_text_and_break(p)[0]
                    for p in tc.iter(f"{_W}p")))
            grid.append(row)
        grids.append(grid)
    return grids


# --------------------------------------------------- table-content composer

_BLOCK_PATTERNS = [
    ("^(20|19)[0-9]{2}[年/-][0-9]{1,2}[月/-][0-9]{1,2}日*$", "Dt"),
    (r"^(20|19)[0-9]{2}年$", "Dt"),
    (r"^(20|19)[0-9]{2}[年/-][0-9]{1,2}月*$", "Dt"),
    ("^[0-9]{1,2}[月/-][0-9]{1,2}日*$", "Dt"),
    (r"^第*[一二三四1-4]季度$", "Dt"),
    (r"^(20|19)[0-9]{2}年*[一二三四1-4]季度$", "Dt"),
    (r"^(20|19)[0-9]{2}[ABCDE]$", "DT"),
    ("^[0-9.,+%/ -]+$", "Nu"),
    (r"^[0-9A-Z/\._~-]+$", "Ca"),
    (r"^[A-Z]*[a-z' -]+$", "En"),
    (r"^[0-9.,+-]+[0-9A-Za-z/$￥%<>（）()' -]+$", "NE"),
    (r"^.{1}$", "Sg"),
]


def _block_type(b: str) -> str:
    """Cell-content classifier (docx_parser.py:35-63).  The person-name
    check (``rag_tokenizer.tag(tk) == "nr"``) needs the stripped huqie
    frequency dictionary, so that branch resolves to "Ot" here — same
    outcome as the reference when the tag is anything but "nr"."""
    for p, n in _BLOCK_PATTERNS:
        if re.search(p, b):
            return n
    from ..textnorm.rag_tokenizer import tokenize
    tks = [t for t in tokenize(b).split() if len(t) > 1]
    if len(tks) > 3:
        return "Tx" if len(tks) < 12 else "Lx"
    return "Ot"


def compose_table_grid(grid: list[list[str]]) -> list[str]:
    """Header-aware "h: v" line composition (docx_parser.py:65-115):
    dominant cell type decides whether interior header rows are detected
    (numeric tables re-anchor headers at every non-numeric row); each data
    row becomes "hdr: cell;…"; narrow tables (≤3 cols) collapse into one
    newline-joined chunk."""
    if len(grid) < 2:
        return []
    width = max(len(r) for r in grid)
    df = [list(r) + [""] * (width - len(r)) for r in grid]

    max_type = Counter(_block_type(str(df[i][j]))
                       for i in range(1, len(df))
                       for j in range(len(df[i])))
    max_type = max(max_type.items(), key=lambda x: x[1])[0]

    colnm = len(df[0])
    hdrows = [0]
    if max_type == "Nu":
        for r in range(1, len(df)):
            tys = Counter(_block_type(str(df[r][j]))
                          for j in range(len(df[r])))
            tys = max(tys.items(), key=lambda x: x[1])[0]
            if tys != max_type:
                hdrows.append(r)

    lines = []
    for i in range(1, len(df)):
        if i in hdrows:
            continue
        hr = [r - i for r in hdrows]
        hr = [r for r in hr if r < 0]
        t = len(hr) - 1
        while t > 0:
            if hr[t] - hr[t - 1] > 1:
                hr = hr[t:]
                break
            t -= 1
        headers = []
        for j in range(len(df[i])):
            seen = []
            for h in hr:
                x = str(df[i + h][j]).strip()
                if x in seen:
                    continue
                seen.append(x)
            t = ",".join(seen)
            if t:
                t += ": "
            headers.append(t)
        cells = []
        for j in range(len(df[i])):
            if not str(df[i][j]):
                continue
            cells.append(headers[j] + str(df[i][j]))
        lines.append(";".join(cells))

    if colnm > 3:
        return lines
    return ["\n".join(lines)]


def docx_parse(binary: bytes, from_page: int = 0,
               to_page: int = 100000000):
    """RAGFlowDocxParser.__call__ equivalent → (sections, composed tables)."""
    secs = docx_paragraphs(binary, from_page, to_page)
    tbls = [compose_table_grid(g) for g in docx_table_grids(binary)]
    return secs, tbls


# ---------------------------------------------------------------------------
# xlsx
# ---------------------------------------------------------------------------

_SS_MAIN = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_R_ATTR = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
           "relationships}id")


def _col_index(ref: str) -> int:
    """'BC12' → 0-based column index 54."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def _cell_value(c, shared: list[str]):
    t = c.get("t", "n")
    v = c.find(f"{_SS_MAIN}v")
    if t == "inlineStr":
        is_el = c.find(f"{_SS_MAIN}is")
        return "".join(el.text or "" for el in is_el.iter(f"{_SS_MAIN}t")) \
            if is_el is not None else None
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "str":
        return v.text
    if t == "b":
        return v.text == "1"
    # numeric: int when integral, float otherwise (openpyxl behavior)
    try:
        f = float(v.text)
        return int(f) if f.is_integer() and "." not in v.text \
            and "e" not in v.text.lower() else f
    except ValueError:
        return v.text


def xlsx_sheets(binary: bytes) -> list[tuple[str, list[list]]]:
    """→ [(sheet name, rows)] with rows as padded value lists (None for
    empty cells), in workbook order."""
    with zipfile.ZipFile(io.BytesIO(binary)) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        rel_map = {r.get("Id"): r.get("Target")
                   for r in rels.iter(f"{_REL_NS}Relationship")}
        shared: list[str] = []
        try:
            ss = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in ss.iter(f"{_SS_MAIN}si"):
                shared.append("".join(el.text or ""
                                      for el in si.iter(f"{_SS_MAIN}t")))
        except KeyError:
            pass
        out = []
        for sheet in wb.iter(f"{_SS_MAIN}sheet"):
            name = sheet.get("name", "Sheet")
            target = rel_map.get(sheet.get(_R_ATTR), "")
            path = target if target.startswith("xl/") else f"xl/{target}"
            ws = ET.fromstring(zf.read(path))
            rows = []
            for row in ws.iter(f"{_SS_MAIN}row"):
                vals: list = []
                for c in row.findall(f"{_SS_MAIN}c"):
                    idx = _col_index(c.get("r", ""))
                    if idx < 0:
                        idx = len(vals)
                    while len(vals) <= idx:
                        vals.append(None)
                    vals[idx] = _cell_value(c, shared)
                rows.append(vals)
            width = max((len(r) for r in rows), default=0)
            rows = [r + [None] * (width - len(r)) for r in rows]
            out.append((name, rows))
        return out


def excel_lines(binary: bytes) -> list[str]:
    """RAGFlowExcelParser.__call__ (excel_parser.py:106-128): row 0 headers;
    each data row → "hdr：val; …"; non-"Sheet*" names appended ' ——name'."""
    res = []
    for name, rows in xlsx_sheets(binary):
        if not rows:
            continue
        ti = rows[0]
        for r in rows[1:]:
            fields = []
            for i, c in enumerate(r):
                if not c:
                    continue
                t = str(ti[i]) if i < len(ti) else ""
                t += ("：" if t else "") + str(c)
                fields.append(t)
            line = "; ".join(fields)
            if name.lower().find("sheet") < 0:
                line += " ——" + name
            res.append(line)
    return res


def excel_html(binary: bytes, chunk_rows: int = 256) -> list[str]:
    """RAGFlowExcelParser.html (excel_parser.py:73-104): <table> chunks of
    ≤chunk_rows data rows, header repeated, sheet name as caption."""
    tb_chunks = []
    for name, rows in xlsx_sheets(binary):
        if not rows:
            continue
        head = "<tr>" + "".join(f"<th>{v}</th>" for v in rows[0]) + "</tr>"
        for chunk_i in range((len(rows) - 1) // chunk_rows + 1):
            tb = f"<table><caption>{name}</caption>" + head
            for r in rows[1 + chunk_i * chunk_rows:
                          1 + (chunk_i + 1) * chunk_rows]:
                tb += "<tr>" + "".join(
                    "<td></td>" if c is None else f"<td>{c}</td>"
                    for c in r) + "</tr>"
            tb += "</table>\n"
            tb_chunks.append(tb)
    return tb_chunks


def excel_row_number(binary: bytes) -> int:
    return sum(len(rows) for _n, rows in xlsx_sheets(binary))


# ---------------------------------------------------------------------------
# pptx
# ---------------------------------------------------------------------------

_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"


def _shape_offset(sp) -> tuple[int, int]:
    xfrm = sp.find(f".//{_A}xfrm")
    if xfrm is not None:
        off = xfrm.find(f"{_A}off")
        if off is not None:
            return int(off.get("y", "0")), int(off.get("x", "0"))
    return 0, 0


def _para_render(p) -> str:
    """Paragraph text with bullet rendering (ppt_parser.py:26-31):
    bulleted → '  '*level + '.' + text."""
    text = "".join(el.text or "" for el in p.iter(f"{_A}t"))
    ppr = p.find(f"{_A}pPr")
    bulleted = False
    level = 0
    if ppr is not None:
        level = int(ppr.get("lvl", "0"))
        for b in (f"{_A}buChar", f"{_A}buAutoNum", f"{_A}buBlip"):
            if ppr.find(b) is not None:
                bulleted = True
                break
    return f"{'  ' * level}.{text}" if bulleted else text


def _extract_shape(sp) -> str | None:
    tag = sp.tag
    if tag == f"{_P}graphicFrame":
        tbl = sp.find(f".//{_A}tbl")
        if tbl is None:
            return None
        grid = []
        for tr in tbl.findall(f"{_A}tr"):
            row = []
            for tc in tr.findall(f"{_A}tc"):
                row.append("".join(el.text or ""
                                   for el in tc.iter(f"{_A}t")))
            grid.append(row)
        if len(grid) < 2:
            return None
        rows = []
        for i in range(1, len(grid)):
            rows.append("; ".join(
                grid[0][j] + ": " + grid[i][j]
                for j in range(len(grid[0])) if j < len(grid[i])))
        return "\n".join(rows)
    if tag == f"{_P}grpSp":
        subs = [s for s in sp
                if s.tag in (f"{_P}sp", f"{_P}graphicFrame", f"{_P}grpSp")]
        texts = []
        for s in sorted(subs, key=lambda x: (_shape_offset(x)[0] // 10,
                                             _shape_offset(x)[1])):
            t = _extract_shape(s)
            if t:
                texts.append(t)
        return "\n".join(texts)
    # p:sp with a text body
    tx = sp.find(f"{_P}txBody")
    if tx is not None:
        texts = []
        for p in tx.findall(f"{_A}p"):
            raw = "".join(el.text or "" for el in p.iter(f"{_A}t"))
            if raw.strip():
                texts.append(_para_render(p))
        return "\n".join(texts)
    return None


def pptx_slides(binary: bytes, from_page: int = 0,
                to_page: int = 100000) -> list[str]:
    """RAGFlowPptParser.__call__ (ppt_parser.py:59-77): per slide, shapes
    sorted by (top // 10, left), texts newline-joined."""
    with zipfile.ZipFile(io.BytesIO(binary)) as zf:
        slide_names = sorted(
            (n for n in zf.namelist()
             if re.fullmatch(r"ppt/slides/slide[0-9]+\.xml", n)),
            key=lambda n: int(re.search(r"([0-9]+)\.xml$", n).group(1)))
        txts = []
        for i, name in enumerate(slide_names):
            if i < from_page:
                continue
            if i >= to_page:
                break
            root = ET.fromstring(zf.read(name))
            tree = root.find(f".//{_P}spTree")
            if tree is None:
                txts.append("")
                continue
            shapes = [s for s in tree
                      if s.tag in (f"{_P}sp", f"{_P}graphicFrame",
                                   f"{_P}grpSp")]
            texts = []
            for sp in sorted(shapes, key=lambda x: (_shape_offset(x)[0] // 10,
                                                    _shape_offset(x)[1])):
                t = _extract_shape(sp)
                if t:
                    texts.append(t)
            txts.append("\n".join(texts))
        return txts


# ---------------------------------------------------------------------------
# writers (deterministic test/bench corpora)
# ---------------------------------------------------------------------------

_CT_DOCX = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
<Override PartName="/word/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.styles+xml"/>
</Types>"""

_RELS_ROOT_DOCX = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
</Relationships>"""


def build_docx(paragraphs: list[tuple[str, str]],
               tables: list[list[list[str]]] | None = None,
               page_break_every: int = 0) -> bytes:
    """paragraphs: [(text, styleId)] — styleId also becomes the display
    name; tables: list of row×cell grids; page_break_every > 0 inserts a
    lastRenderedPageBreak marker every N paragraphs."""
    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    body = []
    style_ids = []
    for i, (text, style) in enumerate(paragraphs):
        ppr = ""
        if style and style != "Normal":
            ppr = f'<w:pPr><w:pStyle w:val="{escape(style)}"/></w:pPr>'
            style_ids.append(style)
        brk = ("<w:r><w:lastRenderedPageBreak/></w:r>"
               if page_break_every and i and i % page_break_every == 0 else "")
        body.append(f'<w:p>{ppr}{brk}<w:r><w:t xml:space="preserve">'
                    f"{escape(text)}</w:t></w:r></w:p>")
    for grid in tables or []:
        rows = "".join(
            "<w:tr>" + "".join(
                f'<w:tc><w:p><w:r><w:t xml:space="preserve">{escape(c)}'
                "</w:t></w:r></w:p></w:tc>" for c in row) + "</w:tr>"
            for row in grid)
        body.append(f"<w:tbl>{rows}</w:tbl>")
    doc = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
           f'<w:document xmlns:w="{w}"><w:body>{"".join(body)}</w:body>'
           f"</w:document>")
    styles = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
              f'<w:styles xmlns:w="{w}">' + "".join(
                  f'<w:style w:styleId="{escape(s)}">'
                  f'<w:name w:val="{escape(s)}"/></w:style>'
                  for s in dict.fromkeys(style_ids)) + "</w:styles>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CT_DOCX)
        zf.writestr("_rels/.rels", _RELS_ROOT_DOCX)
        zf.writestr("word/document.xml", doc)
        zf.writestr("word/styles.xml", styles)
    return buf.getvalue()


def build_xlsx(sheets: list[tuple[str, list[list]]]) -> bytes:
    """sheets: [(name, rows)] with str/int/float/None cells."""
    ss = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    shared: list[str] = []
    shared_idx: dict[str, int] = {}

    def col_ref(j):
        s = ""
        j += 1
        while j:
            j, r = divmod(j - 1, 26)
            s = chr(65 + r) + s
        return s

    sheet_xmls = []
    for _name, rows in sheets:
        rws = []
        for ri, row in enumerate(rows, 1):
            cells = []
            for j, v in enumerate(row):
                if v is None:
                    continue
                ref = f"{col_ref(j)}{ri}"
                if isinstance(v, bool):
                    cells.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
                elif isinstance(v, (int, float)):
                    cells.append(f'<c r="{ref}"><v>{v}</v></c>')
                else:
                    s = str(v)
                    if s not in shared_idx:
                        shared_idx[s] = len(shared)
                        shared.append(s)
                    cells.append(f'<c r="{ref}" t="s">'
                                 f"<v>{shared_idx[s]}</v></c>")
            rws.append(f'<row r="{ri}">{"".join(cells)}</row>')
        sheet_xmls.append(
            f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<worksheet xmlns="{ss}"><sheetData>{"".join(rws)}</sheetData>'
            f"</worksheet>")

    wb_sheets = "".join(
        f'<sheet name="{escape(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, (n, _r) in enumerate(sheets))
    workbook = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                f'<workbook xmlns="{ss}" xmlns:r="{rns}">'
                f"<sheets>{wb_sheets}</sheets></workbook>")
    wb_rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
               '<Relationships xmlns="http://schemas.openxmlformats.org/'
               'package/2006/relationships">' + "".join(
                   f'<Relationship Id="rId{i + 1}" Type="{rns}/worksheet" '
                   f'Target="worksheets/sheet{i + 1}.xml"/>'
                   for i in range(len(sheets))) +
               f'<Relationship Id="rId{len(sheets) + 1}" '
               f'Type="{rns}/sharedStrings" Target="sharedStrings.xml"/>'
               "</Relationships>")
    sst = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
           f'<sst xmlns="{ss}" count="{len(shared)}" '
           f'uniqueCount="{len(shared)}">' + "".join(
               f'<si><t xml:space="preserve">{escape(s)}</t></si>'
               for s in shared) + "</sst>")
    ct = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
          'content-types">'
          '<Default Extension="rels" ContentType="application/vnd.'
          'openxmlformats-package.relationships+xml"/>'
          '<Default Extension="xml" ContentType="application/xml"/>'
          '<Override PartName="/xl/workbook.xml" ContentType="application/'
          'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
          "</Types>")
    root_rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                 '<Relationships xmlns="http://schemas.openxmlformats.org/'
                 'package/2006/relationships">'
                 f'<Relationship Id="rId1" Type="{rns}/officeDocument" '
                 'Target="xl/workbook.xml"/></Relationships>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", ct)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/sharedStrings.xml", sst)
        for i, x in enumerate(sheet_xmls):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", x)
    return buf.getvalue()


def build_pptx(slides: list[list[dict]]) -> bytes:
    """slides: list of shape dicts:
    {"top": emu, "left": emu, "paras": [(text, level, bulleted), ...]}
    or {"top":…, "left":…, "table": grid}."""
    a = "http://schemas.openxmlformats.org/drawingml/2006/main"
    p = "http://schemas.openxmlformats.org/presentationml/2006/main"

    def xfrm(sh):
        return (f'<a:xfrm><a:off x="{sh.get("left", 0)}" '
                f'y="{sh.get("top", 0)}"/>'
                '<a:ext cx="100" cy="100"/></a:xfrm>')

    def shape_xml(sh):
        if "table" in sh:
            rows = "".join(
                "<a:tr>" + "".join(
                    f'<a:tc><a:txBody><a:p><a:r><a:t>{escape(c)}</a:t>'
                    "</a:r></a:p></a:txBody></a:tc>" for c in row) + "</a:tr>"
                for row in sh["table"])
            return (f'<p:graphicFrame><p:xfrm>{xfrm(sh)[8:-9]}</p:xfrm>'
                    f"<a:graphic><a:graphicData><a:tbl>{rows}</a:tbl>"
                    "</a:graphicData></a:graphic></p:graphicFrame>")
        paras = []
        for text, level, bulleted in sh.get("paras", []):
            ppr = (f'<a:pPr lvl="{level}"><a:buChar char="•"/></a:pPr>'
                   if bulleted else
                   (f'<a:pPr lvl="{level}"/>' if level else ""))
            paras.append(f"<a:p>{ppr}<a:r><a:t>{escape(text)}</a:t></a:r>"
                         "</a:p>")
        return (f"<p:sp><p:spPr>{xfrm(sh)}</p:spPr>"
                f'<p:txBody>{"".join(paras)}</p:txBody></p:sp>')

    slide_xmls = []
    for shapes in slides:
        body = "".join(shape_xml(s) for s in shapes)
        slide_xmls.append(
            f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<p:sld xmlns:p="{p}" xmlns:a="{a}"><p:cSld>'
            f"<p:spTree>{body}</p:spTree></p:cSld></p:sld>")

    ct = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
          'content-types">'
          '<Default Extension="rels" ContentType="application/vnd.'
          'openxmlformats-package.relationships+xml"/>'
          '<Default Extension="xml" ContentType="application/xml"/>'
          '<Override PartName="/ppt/presentation.xml" ContentType='
          '"application/vnd.openxmlformats-officedocument.presentationml.'
          'presentation.main+xml"/></Types>')
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    root_rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                 '<Relationships xmlns="http://schemas.openxmlformats.org/'
                 'package/2006/relationships">'
                 f'<Relationship Id="rId1" Type="{rns}/officeDocument" '
                 'Target="ppt/presentation.xml"/></Relationships>')
    pres = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<p:presentation xmlns:p="{p}"/>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", ct)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("ppt/presentation.xml", pres)
        for i, x in enumerate(slide_xmls):
            zf.writestr(f"ppt/slides/slide{i + 1}.xml", x)
    return buf.getvalue()
