"""Box-level merge/filter operators of the DeepDOC PDF pipeline — the
model-free rule paths, re-implemented from:

  * ``_text_merge``              deepdoc/parser/pdf_parser.py:365-419
  * ``_naive_vertical_merge``    pdf_parser.py:421-470
  * ``_filter_forpages``         pdf_parser.py:581-630  (TOC page removal)
  * ``_merge_with_same_bullet``  pdf_parser.py:632-654
  * ``sort_X_by_page``           pdf_parser.py:182-195  (2-column reorder)
  * ``_line_tag`` / ``remove_tag``  pdf_parser.py:893-908, 1126-1127

Boxes: dicts with x0/x1/top/bottom/text/page_number (+layoutno/layout_type).
``mean_height``/``mean_width`` are per-page medians of char heights/widths
(computed by the page parser).  All functions operate on a whole document's
box list — inside the per-doc Arrow batch, matching the reference's
doc-at-a-time structure (SURVEY.md §2.3 Spark mapping).
"""

from __future__ import annotations

import re

from ..textnorm.rag_tokenizer import is_chinese
from .geometry import sort_Y_firstly

_LETTERS = set("qwertyuopasdfghjklzxcvbnm")


def y_dis(a, b):
    return (b["top"] + b["bottom"] - a["top"] - a["bottom"]) / 2


def text_merge(boxes, mean_height):
    """Horizontal merge of same-layout adjacent boxes when |Δy| is under a
    third of the page's mean char height; table/figure/equation excluded."""
    bxs = boxes
    i = 0
    while i < len(bxs) - 1:
        b, b_ = bxs[i], bxs[i + 1]
        if b.get("layoutno", "0") != b_.get("layoutno", "1") or \
                b.get("layout_type", "") in ("table", "figure", "equation"):
            i += 1
            continue
        if abs(y_dis(b, b_)) < mean_height[bxs[i]["page_number"] - 1] / 3:
            bxs[i]["x1"] = b_["x1"]
            bxs[i]["top"] = (b["top"] + b_["top"]) / 2
            bxs[i]["bottom"] = (b["bottom"] + b_["bottom"]) / 2
            bxs[i]["text"] += b_["text"]
            bxs.pop(i + 1)
            continue
        i += 1
    return bxs


def naive_vertical_merge(boxes, mean_height, mean_width, is_english,
                         median_height):
    """Rule-only vertical merge (book/laws modes): punctuation continuation
    vs sentence-end/new-layout/new-column stops; drops page-number boxes."""
    bxs = sort_Y_firstly(boxes, median_height / 3)
    i = 0
    while i + 1 < len(bxs):
        b, b_ = bxs[i], bxs[i + 1]
        if b["page_number"] < b_["page_number"] and \
                re.match(r"[0-9  •一—-]+$", b["text"]):
            bxs.pop(i)
            continue
        if not b["text"].strip():
            bxs.pop(i)
            continue
        concatting_feats = [
            b["text"].strip()[-1] in ",;:'\"，、‘“；：-",
            len(b["text"].strip()) > 1 and b["text"].strip()[-2] in ",;:'\"，‘“、；：",
            b_["text"].strip() and b_["text"].strip()[0] in "。；？！?”）),，、：",
        ]
        feats = [
            b.get("layoutno", 0) != b_.get("layoutno", 0),
            b["text"].strip()[-1] in "。？！?",
            is_english and b["text"].strip()[-1] in ".!?",
            b["page_number"] == b_["page_number"] and
            b_["top"] - b["bottom"] > mean_height[b["page_number"] - 1] * 1.5,
            b["page_number"] < b_["page_number"] and
            abs(b["x0"] - b_["x0"]) > mean_width[b["page_number"] - 1] * 4,
        ]
        detach_feats = [b["x1"] < b_["x0"], b["x0"] > b_["x1"]]
        if (any(feats) and not any(concatting_feats)) or any(detach_feats):
            i += 1
            continue
        b["bottom"] = b_["bottom"]
        b["text"] += b_["text"]
        b["x0"] = min(b["x0"], b_["x0"])
        b["x1"] = max(b["x1"], b_["x1"])
        bxs.pop(i + 1)
    return bxs


def filter_forpages(boxes, n_pages):
    """Remove table-of-contents blocks; else drop pages with >3 leader-dot
    lines. Returns the filtered list."""
    boxes = list(boxes)
    if not boxes:
        return boxes
    findit = False
    i = 0
    while i < len(boxes):
        if not re.match(r"(contents|目录|目次|table of contents|致谢|acknowledge)$",
                        re.sub(r"( | |　)+", "", boxes[i]["text"].lower())):
            i += 1
            continue
        findit = True
        eng = re.match(r"[0-9a-zA-Z :'.-]{5,}", boxes[i]["text"].strip())
        boxes.pop(i)
        if i >= len(boxes):
            break
        prefix = boxes[i]["text"].strip()[:3] if not eng else \
            " ".join(boxes[i]["text"].strip().split()[:2])
        while not prefix:
            boxes.pop(i)
            if i >= len(boxes):
                break
            prefix = boxes[i]["text"].strip()[:3] if not eng else \
                " ".join(boxes[i]["text"].strip().split()[:2])
        boxes.pop(i)
        if i >= len(boxes) or not prefix:
            break
        for j in range(i, min(i + 128, len(boxes))):
            if not re.match(prefix, boxes[j]["text"]):
                continue
            for _ in range(i, j):
                boxes.pop(i)
            break
    if findit:
        return boxes

    page_dirty = [0] * n_pages
    for b in boxes:
        if re.search(r"(··|··|··)", b["text"]):
            page_dirty[b["page_number"] - 1] += 1
    dirty = {i + 1 for i, t in enumerate(page_dirty) if t > 3}
    if not dirty:
        return boxes
    return [b for b in boxes if b["page_number"] not in dirty]


def merge_with_same_bullet(boxes):
    """Merge consecutive boxes starting with the same (non-letter, non-CJK)
    bullet char."""
    i = 0
    while i + 1 < len(boxes):
        b, b_ = boxes[i], boxes[i + 1]
        if not b["text"].strip():
            boxes.pop(i)
            continue
        if not b_["text"].strip():
            boxes.pop(i + 1)
            continue
        if b["text"].strip()[0] != b_["text"].strip()[0] \
                or b["text"].strip()[0].lower() in _LETTERS \
                or is_chinese(b["text"].strip()[0]) \
                or b["top"] > b_["bottom"]:
            i += 1
            continue
        b_["text"] = b["text"] + "\n" + b_["text"]
        b_["x0"] = min(b["x0"], b_["x0"])
        b_["x1"] = max(b["x1"], b_["x1"])
        b_["top"] = b["top"]
        boxes.pop(i)
    return boxes


def sort_X_by_page(arr, threashold):
    """2-column reorder (papers): x-then-y bubble within page."""
    arr = sorted(arr, key=lambda r: (r["page_number"], r["x0"], r["top"]))
    for i in range(len(arr) - 1):
        for j in range(i, -1, -1):
            if abs(arr[j + 1]["x0"] - arr[j]["x0"]) < threashold \
                    and arr[j + 1]["top"] < arr[j]["top"] \
                    and arr[j + 1]["page_number"] == arr[j]["page_number"]:
                arr[j], arr[j + 1] = arr[j + 1], arr[j]
    return arr


def line_tag(bx, page_cum_height, page_heights) -> str:
    """Inline position tag ``@@pn\\tx0\\tx1\\ttop\\tbottom##``
    (pdf_parser.py:893-908; ZM folded into page_heights)."""
    pn = [bx["page_number"]]
    top = bx["top"] - page_cum_height[pn[0] - 1]
    bott = bx["bottom"] - page_cum_height[pn[0] - 1]
    if pn[-1] - 1 >= len(page_heights):
        return ""
    while bott > page_heights[pn[-1] - 1]:
        bott -= page_heights[pn[-1] - 1]
        pn.append(pn[-1] + 1)
        if pn[-1] - 1 >= len(page_heights):
            return ""
    return "@@{}\t{:.1f}\t{:.1f}\t{:.1f}\t{:.1f}##".format(
        "-".join(str(p) for p in pn), bx["x0"], bx["x1"], top, bott)


def remove_tag(txt: str) -> str:
    return re.sub(r"@@[\t0-9.-]+?##", "", txt)


# --------------------------------------------------------- scrap filtering
_PROJ_LEVELS = [
    (r"第[零一二三四五六七八九十百]+章", 1),
    (r"第[零一二三四五六七八九十百]+[条节]", 2),
    (r"[零一二三四五六七八九十百]+[、 　]", 3),
    (r"[\(（][零一二三四五六七八九十百]+[）\)]", 4),
    (r"[0-9]+(、|\.[　 ]|\.[^0-9])", 5),
    (r"[0-9]+\.[0-9]+(、|[. 　]|[^0-9])", 6),
    (r"[0-9]+\.[0-9]+\.[0-9]+(、|[ 　]|[^0-9])", 7),
    (r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+(、|[ 　]|[^0-9])", 8),
    (r".{,48}[：:?？]$", 9),
    (r"[0-9]+）", 10),
    (r"[\(（][0-9]+[）\)]", 11),
    (r"[零一二三四五六七八九十百]+是", 12),
    (r"[⚫•➢✓]", 12),
]


def proj_match(line: str):
    """Project/bullet-level classifier (pdf_parser.py:869-891): None for
    short lines, False for pure numeric/punct lines, else the matched
    outline level (1-12)."""
    if len(line) <= 2:
        return None
    if re.match(r"[0-9 ().,%%+/-]+$", line):
        return False
    for p, j in _PROJ_LEVELS:
        if re.match(p, line):
            return j
    return None


def filterout_scraps(boxes: list, mean_height: list, page_widths: list,
                     line_tags: bool = False, page_cum_height=None,
                     page_heights=None) -> str:
    """Project-bullet DFS grouping + narrow-scrap removal — the full-mode
    assembly of ``PdfParser.__call__`` (pdf_parser.py:910-980).

    Groups boxes into vertical runs seeded at useful boxes (has layout
    type, wide enough, or tall enough); a run extends to following boxes on
    the same page that are useful and either bullet-continuation (mmj) or
    horizontally aligned within page_width/10.  A finished run is kept only
    when it is bullet-led, or its mean width ≥ 35% of the page, or > 200pt
    (narrow scraps — margin notes, page furniture — are dropped).
    Returns the double-newline-joined text (optionally with inline position
    tags, pdf_parser.py:975)."""

    def width(b):
        return b["x1"] - b["x0"]

    def height(b):
        return b["bottom"] - b["top"]

    def usefull(b):
        if b.get("layout_type"):
            return True
        if width(b) > page_widths[b["page_number"] - 1] / 3:
            return True
        if height(b) > mean_height[b["page_number"] - 1]:
            return True
        return False

    boxes = list(boxes)
    res = []
    while boxes:
        lines = []
        widths = []
        pw = page_widths[boxes[0]["page_number"] - 1]
        mh = mean_height[boxes[0]["page_number"] - 1]
        mj = proj_match(boxes[0]["text"]) \
            or boxes[0].get("layout_type", "") == "title"

        # iterative walk of the reference's tail recursion (the recursive
        # form can overflow on a page with 1000+ aligned boxes and then
        # re-emit partially-consumed runs): follow the chain, defer the
        # pops, pop in reverse index order at the end
        if usefull(boxes[0]):
            line, st = boxes[0], 0
            to_pop = []
            while line is not None:
                lines.append(line)
                widths.append(width(line))
                mmj = proj_match(line["text"]) \
                    or line.get("layout_type", "") == "title"
                nxt = None
                for i in range(st + 1, min(st + 20, len(boxes))):
                    if (boxes[i]["page_number"] - line["page_number"]) > 0:
                        break
                    if not mmj and y_dis(line, boxes[i]) >= 3 * mh \
                            and height(line) < 1.5 * mh:
                        break
                    if not usefull(boxes[i]):
                        continue
                    if mmj or (min(abs(boxes[i]["x1"] - line["x0"]),
                                   abs(boxes[i]["x0"] - line["x1"]),
                                   abs(boxes[i]["x0"] + boxes[i]["x1"]
                                       - line["x0"] - line["x1"]) / 2)
                               < pw / 10):
                        nxt = i
                        break
                if nxt is None:
                    break
                to_pop.append(nxt)
                line, st = boxes[nxt], nxt
            for i in reversed(to_pop):
                boxes.pop(i)
        boxes.pop(0)
        if not widths:
            continue
        mw = sum(widths) / len(widths)
        if mj or mw / pw >= 0.35 or mw > 200:
            if line_tags and page_cum_height is not None:
                res.append("\n".join(
                    c["text"] + line_tag(c, page_cum_height, page_heights)
                    for c in lines))
            else:
                res.append("\n".join(c["text"] for c in lines))
    return "\n\n".join(res)
