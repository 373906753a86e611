"""Table/figure extraction from the layout-tagged box stream.

Re-implementation of ``deepdoc/parser/pdf_parser.py:656-867``
(``_extract_table_figure``) minus the raster crops (``cropout`` returns a
PIL image there; image codecs are the documented out-of-scope stage here —
the positions the crop would use are retained instead):

  * boxes whose ``layout_type`` is ``table`` / ``figure`` are popped from
    the text stream and grouped by ``(page, layoutno)``; source-attribution
    lines (``(数据|资料|图表)*来源[:： ]``) are dropped outright
    (pdf_parser.py:675-693);
  * a group is "no-merge" when the preceding grouped layout was followed by
    a caption/title/reference box (pdf_parser.py:668-674);
  * cross-page table merge: adjacent pages, predecessor not no-merge,
    vertical gap ≤ 23 × mean page height (pdf_parser.py:697-716);
  * caption boxes (``is_caption``) attach to the nearest group by squared
    y-distance plus squared x-distance (x term zero when x-ranges overlap),
    tables winning ties; the caption box is removed from the text stream
    either way (pdf_parser.py:722-768);
  * output: figures → joined text; tables → ``construct_table`` over the
    Y-sorted group (caption boxes folded into the table caption there);
    positions = per-page bounding boxes of the group (pdf_parser.py:770-829
    ``cropout`` sans image).
"""

from __future__ import annotations

import re
import statistics

from .boxops import y_dis
from .geometry import sort_Y_firstly
from .tsr import construct_table, is_caption

_SOURCE_RE = re.compile(r"(数据|资料|图表)*来源[:： ]")
_NOMERGE_TYPES = ("table caption", "title", "figure caption", "reference")


def _x_dis(a, b) -> float:
    return min(abs(a["x1"] - b["x0"]), abs(a["x0"] - b["x1"]),
               abs(a["x0"] + a["x1"] - b["x0"] - b["x1"]) / 2)


def _x_overlapped(a, b) -> bool:
    return not (a["x1"] < b["x0"] or a["x0"] > b["x1"])


def _group_boxes(boxes, need_figure):
    """First pass (pdf_parser.py:662-693): pop table/figure boxes into
    per-(page, layoutno) groups; collect no-merge layout keys."""
    tables: dict[str, list] = {}
    figures: dict[str, list] = {}
    remaining = []
    lst_lout_no = ""
    nomerge = set()
    for b in boxes:
        if "layoutno" not in b:
            remaining.append(b)
            continue
        lout_no = f'{b["page_number"]}-{b["layoutno"]}'
        if is_caption(b) or b.get("layout_type") in _NOMERGE_TYPES:
            nomerge.add(lst_lout_no)
        ltype = b.get("layout_type")
        if ltype == "table" or (need_figure and ltype == "figure"):
            if _SOURCE_RE.match(b["text"]):
                continue                      # dropped outright
            dst = tables if ltype == "table" else figures
            dst.setdefault(lout_no, []).append(b)
            lst_lout_no = lout_no
            continue
        remaining.append(b)
    return remaining, tables, figures, nomerge


def _merge_cross_page(tables, nomerge, mean_height):
    """Second pass (pdf_parser.py:697-716): merge a table group into its
    predecessor when they sit on adjacent pages within 23 mean heights."""
    tbls = sorted(tables.items(), key=lambda x: (x[1][0]["top"],
                                                 x[1][0]["x0"]))
    i = len(tbls) - 1
    while i - 1 >= 0:
        k0, bxs0 = tbls[i - 1]
        k, bxs = tbls[i]
        i -= 1
        if k0 in nomerge:
            continue
        pg, pg0 = bxs[0]["page_number"], bxs0[0]["page_number"]
        if pg == pg0 or pg - pg0 > 1:
            continue
        mh = mean_height[min(pg - 1, len(mean_height) - 1)] \
            if mean_height else 1.0
        if y_dis(bxs0[-1], bxs[0]) > mh * 23:
            continue
        tables[k0].extend(tables[k])
        del tables[k]


def _attach_captions(remaining, tables, figures):
    """Third pass (pdf_parser.py:722-768): nearest-group caption attach;
    caption boxes leave the text stream regardless."""

    def nearest(c, groups):
        mink, minv = "", 10 ** 9
        for k, bxs in groups.items():
            for b in bxs:
                if b.get("layout_type", "").find("caption") >= 0:
                    continue
                yd = y_dis(c, b)
                xd = 0 if _x_overlapped(c, b) else _x_dis(c, b)
                d = yd * yd + xd * xd
                if d < minv:
                    mink, minv = k, d
        return mink, minv

    kept = []
    for c in remaining:
        if not is_caption(c):
            kept.append(c)
            continue
        tk, tv = nearest(c, tables)
        fk, fv = nearest(c, figures)
        if tv < fv and tk:
            tables[tk].insert(0, c)
        elif fk:
            figures[fk].insert(0, c)
    return kept


def extract_table_figure(boxes, mean_height, need_figure=True,
                         return_html=True, is_english=False,
                         page_cum_height=None):
    """→ (remaining_boxes, results).

    ``results``: list of ``{"type": "figure"|"table", "content", "poss"}``
    in the reference's emission order (figures first, then tables);
    ``content`` is the joined caption+text for figures and the
    ``construct_table`` output (html string or linearized rows) for tables;
    ``poss`` = [(page0, x0, x1, top, bottom), ...] per covered page, with
    tops expressed relative to the page (``page_cum_height`` subtracted
    when given) — the crop rectangles the reference would rasterize."""
    remaining, tables, figures, nomerge = _group_boxes(boxes, need_figure)
    _merge_cross_page(tables, nomerge, mean_height)
    remaining = _attach_captions(remaining, tables, figures)

    def positions(bxs):
        pages: dict[int, list] = {}
        for b in bxs:
            pages.setdefault(b["page_number"] - 1, []).append(b)
        poss = []
        for pn in sorted(pages):
            arr = pages[pn]
            ht = page_cum_height[pn] if page_cum_height else 0
            poss.append((pn,
                         min(b["x0"] for b in arr),
                         max(b["x1"] for b in arr),
                         min(b["top"] for b in arr) - ht,
                         max(b["bottom"] for b in arr) - ht))
        return poss

    results = []
    for bxs in figures.values():
        txt = "\n".join(b["text"] for b in bxs)
        if not txt:
            continue
        results.append({"type": "figure", "content": txt,
                        "poss": positions(bxs)})
    for bxs in tables.values():
        if not bxs:
            continue
        halves = [(b["bottom"] - b["top"]) / 2 for b in bxs]
        srt = sort_Y_firstly(bxs, statistics.fmean(halves))
        results.append({"type": "table",
                        "content": construct_table(list(srt),
                                                   is_english=is_english,
                                                   html=return_html),
                        "poss": positions(bxs)})
    return remaining, results
