"""VisionParser route — the vision-LLM PDF path of the naive template.

Reference surface (re-expressed, not ported):

* ``VisionParser`` (`/root/reference/deepdoc/parser/pdf_parser.py:1262-1306`):
  render every PDF page to an image, send each image through the
  image2text model with ``vision_llm_describe_prompt`` (word-for-word
  markdown transcription + ``--- Page {n} ---`` divider,
  `rag/prompts.py:369-395`), collect one markdown doc per non-empty page
  (``vision_llm_chunk`` prepends ``"\\n"`` to each answer,
  `rag/app/picture.py:63-89`), return ``[(doc, "") ...]`` sections.
* Call site (`rag/app/naive.py:405-412`): when ``layout_recognizer`` names
  a vision model, the sections then flow through the same ``naive_merge``
  chunking as every other naive-route parser.
* ``VisionFigureParser`` (`deepdoc/parser/figure_parser.py:31-111`): each
  extracted figure image is described via
  ``vision_llm_figure_describe_prompt`` (structured "- Visual Type: ..."
  report, `rag/prompts.py:398-427`) and the text is PREPENDED to the
  figure's caption list: ``descriptions[i] = txt + "\\n".join(desc)``.

The vision model itself is an external LLM asset (same contract as the
YOLO/OCR/XGB slots): ``VisionSlot`` is the pluggable seam —
``RAG_VISION_MODEL=module:callable`` routes real ``(png_bytes, prompt) →
markdown`` inference through it unchanged.  The DEFAULT slot is a
deterministic stand-in that transcribes the page's born-digital text-box
layer into markdown exactly as a perfect transcription model would under
the prompt's rules (word-for-word, reading order, heading markup from
oversized lines, the page divider) — the same move as the rule proposer
in the YOLO slot.  The Spark-side dataflow (page raster, Arrow batching,
per-page section assembly, greedy chunk packing) is the real deliverable
and is identical for either slot.

Spark shape: one ``mapInPandas`` over the PDF binaries — no shuffle, no
per-row Python; failures become status rows (same contract as
``pdf_extract.pdf_chunks_df``).
"""

from __future__ import annotations

import importlib
import os

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (IntegerType, LongType, StringType,
                               StructField, StructType)

from ..media.codecs import encode_png
from ..pdf.plain import PAGE_HEIGHT, extract_pdf_boxes

PAGE_WIDTH = 612.0  # MediaBox width of the native writer (plain.py:53)
from ..session import ordered as _ordered
from ..textnorm.xxh64 import xxh64_hexdigest
from .pdf_extract import _WC_CTE, _spread_docs, _synth_pdfs


# --------------------------------------------------------------- the slot
def vision_llm_describe_prompt(page: int | None = None) -> str:
    """Transcription prompt contract (rag/prompts.py:369-395): word-for-word
    markdown, no invention, divider appended when a page number is given."""
    p = ("Transcribe the content from the provided PDF page image into "
         "clean Markdown format. Transcribe content word-for-word; "
         "preserve the original language, information, and order.")
    if page is not None:
        p += (" At the end of the transcription, add the page divider: "
              f"`--- Page {page} ---`.")
    return p


class VisionSlot:
    """Pluggable image2text seam (contract of ``LLMBundle(...IMAGE2TEXT)``,
    rag/app/naive.py:407-408).  ``describe(png, prompt, layer=...)`` —
    a real model reads the pixels; the deterministic default transcribes
    the ``layer`` (the page's text boxes) under the same prompt rules.
    Pickle-safe: resolves the plugged callable lazily per worker."""

    ENV = "RAG_VISION_MODEL"

    def __init__(self):
        self._fn = None
        self._resolved = False

    def __getstate__(self):
        return {}

    def __setstate__(self, _state):
        self._fn = None
        self._resolved = False

    def _resolve(self):
        spec = os.environ.get(self.ENV, "")
        if spec:
            mod, _, attr = spec.partition(":")
            self._fn = getattr(importlib.import_module(mod), attr)
        self._resolved = True

    def describe(self, png: bytes, prompt: str, layer=None,
                 page_no: int | None = None) -> str:
        if not self._resolved:
            self._resolve()
        if self._fn is not None:
            return self._fn(png, prompt)
        return transcribe_boxes(layer or [], page_no)


def transcribe_boxes(boxes: list[dict], page_no: int | None = None) -> str:
    """Deterministic transcription of a page's text-box layer into the
    markdown the describe prompt asks for: reading order (top, then x0),
    one line per box, ``## `` markup for lines ≥1.5× the page's median
    height (rule 7: structure strictly from layout), divider appended."""
    if not boxes:
        return ""
    hs = sorted(b["bottom"] - b["top"] for b in boxes)
    med = hs[len(hs) // 2]
    out = []
    for b in sorted(boxes, key=lambda b: (b["top"], b["x0"])):
        txt = b["text"].strip()
        if not txt:
            continue
        if b["bottom"] - b["top"] >= 1.5 * med and med > 0:
            txt = "## " + txt
        out.append(txt)
    md = "\n".join(out)
    if md and page_no is not None:
        md += f"\n--- Page {page_no} ---"
    return md


def render_page_png(boxes: list[dict], scale: float = 0.25) -> bytes:
    """Rasterize one page's boxes to a grayscale PNG (the ``to_image``
    stage of ``VisionParser.__images__``, pdf_parser.py:1267-1274): white
    canvas, text boxes darkened.  Downscaled — the raster feeds the model
    slot, not human eyes."""
    w, h = int(PAGE_WIDTH * scale), int(PAGE_HEIGHT * scale)
    px = bytearray(b"\xff" * (w * h))
    for b in boxes:
        x0 = max(0, min(w - 1, int(b["x0"] * scale)))
        x1 = max(0, min(w - 1, int(b["x1"] * scale)))
        t = max(0, min(h - 1, int(b["top"] * scale)))
        bt = max(0, min(h - 1, int(b["bottom"] * scale)))
        for y in range(t, bt + 1):
            row = y * w
            for x in range(x0, x1 + 1):
                px[row + x] = 0x30
    return encode_png(bytes(px), w, h, 1)


# ------------------------------------------------------------- the parser
class VisionParser:
    """Per-page image → model → markdown docs (pdf_parser.py:1280-1306):
    pages outside [from_page, to_page) are skipped, empty transcriptions
    are dropped, each kept page becomes one ``(doc, "")`` section where
    ``doc = "\\n" + answer`` (picture.py:80-84)."""

    def __init__(self, vision_model: VisionSlot | None = None):
        self.vision_model = vision_model or VisionSlot()

    def __call__(self, pdf: bytes, from_page: int = 0,
                 to_page: int = 100000):
        boxes = extract_pdf_boxes(pdf)
        n_pages = max((b["page_number"] for b in boxes), default=0)
        by_page: dict[int, list[dict]] = {}
        for b in boxes:
            by_page.setdefault(b["page_number"], []).append(b)
        docs = []
        for pn in range(1, n_pages + 1):
            if pn - 1 < from_page or pn - 1 >= min(to_page, n_pages):
                continue
            layer = by_page.get(pn, [])
            png = render_page_png(layer)
            ans = self.vision_model.describe(
                png, vision_llm_describe_prompt(page=pn), layer=layer,
                page_no=pn)
            if ans:
                docs.append("\n" + ans)
        return [(d, "") for d in docs], []


VISION_CHUNKS_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("status", StringType(), False),
    StructField("n_pages", IntegerType(), False),
    StructField("chunk_seq", IntegerType(), False),
    StructField("chunk_id", StringType(), True),
    StructField("chunk_text", StringType(), True),
    StructField("token_cnt", IntegerType(), False),
])


def vision_pdf_chunks_df(pdfs: DataFrame,
                         chunk_token_num: int = 128) -> DataFrame:
    """pdfs(doc_id, pdf binary) → VisionParser sections → naive_merge
    chunks (the naive.py:405-418 path after the parser call)."""
    from ..chunkers.naive import naive_merge_with_counts

    def run(batches):
        parser = VisionParser()
        for pdf_batch in batches:
            out = []
            for doc_id, blob in zip(pdf_batch["doc_id"], pdf_batch["pdf"]):
                doc_id = int(doc_id)
                try:
                    sections, _tbls = parser(bytes(blob))
                    if not sections:
                        out.append((doc_id, "empty", 0, 0, None, None, 0))
                        continue
                    n_pages = len(sections)
                    cks, tknums = naive_merge_with_counts(
                        sections, chunk_token_num)
                    for i, (ck, tn) in enumerate(zip(cks, tknums)):
                        out.append((doc_id, "ok", n_pages, i,
                                    xxh64_hexdigest(ck + str(doc_id)),
                                    ck, tn))
                except Exception:
                    out.append((doc_id, "error", 0, 0, None, None, 0))
            yield pd.DataFrame(out, columns=[f.name
                                             for f in VISION_CHUNKS_SCHEMA])

    return pdfs.mapInPandas(run, VISION_CHUNKS_SCHEMA)


def vision_pdf_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: documents.text → deterministic PDFs (the shared
    ``_synth_pdfs`` generator) → VisionParser transcription → chunks."""
    pdfs = _synth_pdfs(spark, sf_dir)
    return (vision_pdf_chunks_df(pdfs)
            .select("doc_id", "status", "n_pages", "chunk_seq",
                    "chunk_text", "token_cnt")
            .transform(_ordered("doc_id", "chunk_seq")))


# Oracle: re-derive the transcription arithmetic relationally.  The synth
# PDFs are 10-word '.'-terminated lines, 40 per page; the transcription is
# those lines joined by '\n' plus the page divider; each page is one
# section of '\n'+page_md; greedy late-close packing over sections.  Token
# costs under the shipped class-pure BPE (sql_shared): a line costs
# bare(w1)+Σsp(w)+1, every '\n' costs 1, the divider '\n--- Page N ---'
# costs 10+ceil(digits/3) (all constants checked against the real encoder
# in tests/test_vision_llm.py).
VISION_PDF_SQL = rf"""
WITH RECURSIVE toklists AS (
  SELECT doc_id, string_split(text, ' ') AS l, len(string_split(text, ' ')) AS n
  FROM documents WHERE length(trim(text)) > 0),
{_WC_CTE},
words AS (
  SELECT doc_id, n, unnest(l) AS w, generate_subscripts(l, 1) AS wi
  FROM toklists),
lines AS (
  SELECT doc_id, CAST((wi-1) // 10 AS BIGINT) AS ln,
         string_agg(words.w, ' ' ORDER BY wi) || '.' AS txt,
         sum(CASE WHEN (wi-1) % 10 = 0 THEN c.bare_c ELSE c.sp_c END)
           + 1 AS tok
  FROM words JOIN wc c ON c.w = words.w
  GROUP BY doc_id, (wi-1) // 10),
pages AS (
  SELECT doc_id, ln // 40 AS pg,
         chr(10) || string_agg(txt, chr(10) ORDER BY ln)
           || chr(10) || '--- Page ' || CAST(pg + 1 AS VARCHAR) || ' ---'
           AS sec,
         1 + sum(tok) + (count(*) - 1)
           + 10 + CAST(ceil(length(CAST(pg + 1 AS VARCHAR)) / 3.0) AS BIGINT)
           AS tok
  FROM lines GROUP BY doc_id, ln // 40),
pack AS (
  SELECT doc_id, pg, sec, tok, 0 AS cseq, tok AS run
  FROM pages WHERE pg = 0
  UNION ALL
  SELECT pp.doc_id, p.pg, p.sec, p.tok,
         CASE WHEN pp.run > 128 THEN pp.cseq + 1 ELSE pp.cseq END,
         CASE WHEN pp.run > 128 THEN p.tok ELSE pp.run + p.tok END
  FROM pack pp JOIN pages p ON p.doc_id = pp.doc_id AND p.pg = pp.pg + 1)
SELECT p.doc_id, 'ok' AS status,
       CAST(ceil(ceil(t.n/10.0)/40.0) AS INTEGER) AS n_pages,
       CAST(p.cseq AS INTEGER) AS chunk_seq,
       string_agg(p.sec, '' ORDER BY p.pg) AS chunk_text,
       CAST(sum(p.tok) AS INTEGER) AS token_cnt
FROM pack p JOIN toklists t ON t.doc_id = p.doc_id
GROUP BY p.doc_id, p.cseq, t.n
ORDER BY p.doc_id, chunk_seq
"""


# ----------------------------------------------------- figure description
def vision_llm_figure_describe_prompt() -> str:
    """Figure-analysis prompt contract (rag/prompts.py:398-427)."""
    return ("Analyze the image and provide a comprehensive description of "
            "its content: visual type, title, labels, data points.")


def describe_figure_md(caption: str) -> str:
    """Deterministic stand-in for the figure-describe slot: the structured
    report skeleton the prompt's output format mandates, filled from the
    figure's own caption layer (rule: only details explicitly present)."""
    cap = " ".join((caption or "").split())
    return f"- Visual Type: figure\n- Title: {cap}" if cap else ""


def vision_figure_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VisionFigureParser dataflow (figure_parser.py:31-111): every figure
    popped by ``_extract_table_figure`` is rasterized, described through
    the vision slot with ``vision_llm_figure_describe_prompt``, and the
    answer is PREPENDED to the figure's caption join --
    ``descriptions[i] = txt + "\\n".join(descriptions[i])``
    (figure_parser.py:86-88).  The box stream per document is a
    deterministic layout-tagged figure + caption pair; the REAL
    caption-attach (nearest-group squared distance) runs before the slot.
    One mapInPandas, no shuffle; slot inference stays in the Arrow batch."""
    from ..pdf.tablefig import extract_table_figure

    docs = _spread_docs(spark, sf_dir)

    def run(batches):
        slot = VisionSlot()
        for pdf_b in batches:
            out = []
            for doc_id, text in zip(pdf_b["doc_id"], pdf_b["text"]):
                doc_id = int(doc_id)
                words = (text or "").split()
                if not words:
                    continue
                fig = {"x0": 72, "top": 700, "x1": 300, "bottom": 712,
                       "text": "figure " + " ".join(words[:4]),
                       "page_number": 1, "layout_type": "figure",
                       "layoutno": "f0"}
                cap = {"x0": 72, "top": 720, "x1": 260, "bottom": 732,
                       "text": f"figure caption for doc {doc_id}",
                       "page_number": 1, "layout_type": "figure caption",
                       "layoutno": "fc0"}
                try:
                    _rem, res = extract_table_figure(
                        [dict(fig), dict(cap)], [12.0], return_html=True)
                    for r in res:
                        if r["type"] != "figure":
                            continue
                        caption = r["content"].split("\n", 1)[0]
                        png = render_page_png([fig, cap])
                        txt = slot.describe(
                            png, vision_llm_figure_describe_prompt(),
                            layer=None) or describe_figure_md(caption)
                        out.append((doc_id, caption,
                                    txt + "\n" + r["content"]))
                except Exception:
                    out.append((doc_id, None, None))
            yield pd.DataFrame(out, columns=[f.name
                                             for f in FIGURE_DESC_SCHEMA])

    return (docs.mapInPandas(run, FIGURE_DESC_SCHEMA)
            .transform(_ordered("doc_id")))


FIGURE_DESC_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("caption", StringType(), True),
    StructField("figure_text", StringType(), True),
])


# Oracle: the caption attaches first (figures[fk].insert(0, c)) so figure
# content is 'caption\nfigure w1..w4'; the describe stand-in is the report
# skeleton over the caption; the enhancement prepends it with '\n'.
VISION_FIGURE_SQL = r"""
WITH t AS (
  SELECT doc_id,
         'figure caption for doc ' || CAST(doc_id AS VARCHAR) AS cap,
         'figure ' || array_to_string(
             list_slice(string_split(text, ' '), 1, 4), ' ') AS figtxt
  FROM documents WHERE length(trim(text)) > 0)
SELECT doc_id, cap AS caption,
       '- Visual Type: figure' || chr(10) || '- Title: ' || cap
         || chr(10) || cap || chr(10) || figtxt AS figure_text
FROM t
ORDER BY doc_id
"""


QUERIES = {
    "vision_pdf_template": (vision_pdf_template, VISION_PDF_SQL),
    "vision_figure_describe": (vision_figure_describe, VISION_FIGURE_SQL),
}
