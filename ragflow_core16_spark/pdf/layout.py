"""Layout recognition: region → box tagging glue + rule-based proposer.

Reference analogue: ``deepdoc/vision/layout_recognizer.py:60-157``
(``LayoutRecognizer.__call__``).  In the reference the page's layout
REGIONS come from a YOLO ONNX model (a runtime HuggingFace download —
an external asset, like OCR/TSR); everything AFTER the model is
deterministic glue, and that glue is what this module implements
natively:

  * garbage-text regexes (bullet runs, ``3 / 10`` page markers,
    ``http://…`` footers, ``(cid: N)`` artifacts) pop boxes before any
    assignment (layout_recognizer.py:62-67);
  * per-type assignment passes in the reference's fixed order, each box
    claimed by its max-overlap region of that type at overlap ≥ 0.4
    (layout_recognizer.py:92-131);
  * header/footer/reference regions are garbage: their boxes are
    dropped UNLESS positional keep-feats fire (a "footer" box that
    actually sits above 0.9·page-height, a "header" box below
    0.1·page-height — model false positives) (:110-121);
  * equation boxes fold into ``figure`` (:125);
  * figure/equation regions that claimed no text box become empty
    placeholder boxes so downstream figure extraction still sees them
    (:133-143);
  * texts dropped into the same garbage bin MORE THAN ONCE form a
    corpus-wide kill set — running headers/footers repeat per page, so
    any stray survivor with an identical text is removed too
    (:148-156).

The model slot is filled by ``propose_layouts`` — a deterministic
rule-based region proposer over born-digital text boxes (position bands,
caption/heading regexes, column grouping), the same stand-in strategy as
the TSR rule path (``pdf/tsr.py``) and the concat rule scorer
(``pdf/concat.py``).  Swap it for real model output by passing your own
``page_layouts`` to ``tag_layouts``; the glue is model-agnostic.
"""

from __future__ import annotations

import re
from collections import Counter

from .geometry import (find_overlapped_with_threashold, layouts_cleanup,
                       sort_Y_firstly)

GARBAGE_LAYOUTS = ("footer", "header", "reference")

# layout_recognizer.py:62-67
_GARBAGE_PATTERNS = [
    r"^•+$",
    r"^[0-9]{1,2} / ?[0-9]{1,2}$",
    r"^[0-9]{1,2} of [0-9]{1,2}$",
    r"^http://[^ ]{12,}",
    r"\(cid *: *[0-9]+ *\)",
]

# assignment pass order (layout_recognizer.py:127-128): garbage types
# claim their boxes FIRST so a header line inside a text column is
# dropped, not merged into the paragraph
_ASSIGN_ORDER = ["footer", "header", "reference", "figure caption",
                 "table caption", "title", "table", "text", "figure",
                 "equation"]


def is_garbage_text(text: str) -> bool:
    return any(re.search(p, text) for p in _GARBAGE_PATTERNS)


def tag_layouts(page_boxes, page_layouts, page_heights,
                thr: float = 0.4, drop: bool = True):
    """Assign ``layout_type``/``layoutno`` to every text box from its
    page's layout regions; drop garbage-region boxes.

    ``page_boxes``: per-page lists of box dicts (x0/x1/top/bottom/text,
    page_number); ``page_layouts``: per-page lists of region dicts
    (type/score/x0/x1/top/bottom); ``page_heights``: per-page heights in
    the same coordinate units.  Returns ``(boxes, page_layout)`` exactly
    like the reference ``__call__`` — boxes flattened across pages with
    garbage removed, and the cleaned region lists.
    """
    assert len(page_boxes) == len(page_layouts) == len(page_heights)
    boxes = []
    garbages: dict[str, list[str]] = {}
    page_layout = []
    for pn, (bxs, lts_in) in enumerate(zip(page_boxes, page_layouts)):
        page_h = page_heights[pn]
        page_box_src = list(bxs)  # pre-pop snapshot (placeholder page_no)
        # low-score garbage regions are dropped; other types survive any
        # score (layout_recognizer.py:79-84)
        lts = [{"type": lt["type"], "score": float(lt.get("score", 1.0)),
                "x0": lt["x0"], "x1": lt["x1"],
                "top": lt["top"], "bottom": lt["bottom"],
                "page_number": pn}
               for lt in lts_in
               if float(lt.get("score", 1.0)) >= 0.4
               or lt["type"] not in GARBAGE_LAYOUTS]
        if lts:
            mh = sum(lt["bottom"] - lt["top"] for lt in lts) / len(lts)
            lts = sort_Y_firstly(lts, mh / 2)
        lts = layouts_cleanup(bxs, lts)
        page_layout.append(lts)

        def find_layout(ty):
            lts_ = [lt for lt in lts if lt["type"] == ty]
            i = 0
            while i < len(bxs):
                if bxs[i].get("layout_type"):
                    i += 1
                    continue
                if is_garbage_text(bxs[i]["text"]):
                    bxs.pop(i)
                    continue
                ii = find_overlapped_with_threashold(bxs[i], lts_, thr=thr)
                if ii is None:
                    bxs[i]["layout_type"] = ""
                    i += 1
                    continue
                lts_[ii]["visited"] = True
                keep_feats = [
                    lts_[ii]["type"] == "footer"
                    and bxs[i]["bottom"] < page_h * 0.9,
                    lts_[ii]["type"] == "header"
                    and bxs[i]["top"] > page_h * 0.1,
                ]
                if drop and lts_[ii]["type"] in GARBAGE_LAYOUTS \
                        and not any(keep_feats):
                    garbages.setdefault(lts_[ii]["type"], [])
                    garbages[lts_[ii]["type"]].append(bxs[i]["text"])
                    bxs.pop(i)
                    continue
                bxs[i]["layoutno"] = f"{ty}-{ii}"
                bxs[i]["layout_type"] = lts_[ii]["type"] \
                    if lts_[ii]["type"] != "equation" else "figure"
                i += 1

        for ty in _ASSIGN_ORDER:
            find_layout(ty)

        # figure/equation regions with no text box → empty placeholder
        # (layout_recognizer.py:133-143).  Divergence from the reference:
        # the placeholder's page_number follows the PAGE'S BOX convention
        # (1-based in this repo) instead of the region's 0-based page
        # index — the reference keeps the 0-based index, which mis-keys
        # the placeholder in downstream per-page grouping.
        page_no = next((b["page_number"] for b in page_box_src
                        if "page_number" in b), pn + 1)
        for i, lt in enumerate([lt for lt in lts
                                if lt["type"] in ("figure", "equation")]):
            if lt.get("visited"):
                continue
            ph = {k: v for k, v in lt.items() if k != "type"}
            ph["text"] = ""
            ph["layout_type"] = "figure"
            ph["layoutno"] = f"figure-{i}"
            ph["page_number"] = page_no
            bxs.append(ph)
        boxes.extend(bxs)

    # corpus-wide repeated-garbage kill set (layout_recognizer.py:148-156)
    garbag_set = set()
    for k, texts in garbages.items():
        for g, c in Counter(texts).items():
            if c > 1:
                garbag_set.add(g)
    boxes = [b for b in boxes if b["text"].strip() not in garbag_set]
    return boxes, page_layout


# ------------------------------------------------- rule-based proposer
_CAPTION_TABLE = re.compile(r"(?i)^(table|tab\.?)\s*[0-9ivx]")
_CAPTION_FIGURE = re.compile(r"(?i)^(figure|fig\.?)\s*[0-9ivx]")
_REFERENCE_HEADING = re.compile(r"(?i)^(references|bibliography)\s*$")

HEADER_BAND = 0.08   # top fraction of the page proposed as header
FOOTER_BAND = 0.92   # bottom fraction start proposed as footer
TITLE_BAND = 0.18    # first-page band eligible for the title region


def _classify(b, page_w, page_h, pn, in_references):
    t = b["text"].strip()
    if b["bottom"] <= page_h * HEADER_BAND:
        return "header"
    if b["top"] >= page_h * FOOTER_BAND:
        return "footer"
    if _REFERENCE_HEADING.match(t) or in_references:
        return "reference"
    if _CAPTION_TABLE.match(t):
        return "table caption"
    if _CAPTION_FIGURE.match(t):
        return "figure caption"
    if pn == 0 and b["top"] <= page_h * TITLE_BAND \
            and 0 < len(t.split()) <= 16 and not t.endswith("."):
        return "title"
    return "text"


def _table_grids(ordered, med_h):
    """Grids of cell boxes under a ``Table N`` caption: consecutive
    baseline rows of ≥2 boxes, first row within 3·med_h of the caption,
    later rows within 2·med_h of the previous one.  Returns a list of
    grids (lists of member boxes); captions are not members."""
    # baseline rows: boxes sharing a top within med_h/2
    rows = []
    for b in ordered:
        if rows and abs(b["top"] - rows[-1][0]["top"]) <= med_h / 2:
            rows[-1].append(b)
        else:
            rows.append([b])
    grids = []
    taken = set()
    for cap in ordered:
        if not _CAPTION_TABLE.match(cap["text"].strip()):
            continue
        grid = []
        prev_bottom = cap["bottom"]
        first = True
        for row in rows:
            if row[0]["top"] <= cap["bottom"]:
                continue
            gap = row[0]["top"] - prev_bottom
            if len(row) < 2 or id(row[0]) in taken \
                    or gap > (3 if first else 2) * med_h:
                if grid:
                    break
                continue
            grid.extend(row)
            prev_bottom = max(b["bottom"] for b in row)
            first = False
        if grid:
            grids.append(grid)
            taken.update(id(b) for b in grid)
    return grids


def propose_layouts(bxs, page_w, page_h, page_number=0):
    """Deterministic rule-based layout-region proposer (the YOLO model
    slot): position bands for header/footer, caption and reference-heading
    regexes, first-page title band, and a table-grid rule (rows of ≥2
    boxes sharing a baseline directly under a ``Table N`` caption);
    consecutive same-class boxes in the same column (x-overlap, vertical
    gap ≤ 1.5·median height) fuse into one region.  Scores are 1.0 —
    rule proposals are definitional here, not confidences."""
    if not bxs:
        return []
    ordered = sort_Y_firstly(
        list(bxs), sum(b["bottom"] - b["top"] for b in bxs) / len(bxs) / 2)
    heights = sorted(b["bottom"] - b["top"] for b in ordered)
    med_h = heights[len(heights) // 2]
    grids = _table_grids(ordered, med_h)
    grid_of = {id(b): gi for gi, grid in enumerate(grids) for b in grid}
    emitted_grids = set()
    in_refs = False
    regions = []
    cur = None
    for b in ordered:
        gi = grid_of.get(id(b))
        if gi is not None:
            # one region per grid, spanning its bounding box
            if gi not in emitted_grids:
                emitted_grids.add(gi)
                regions.append({
                    "type": "table", "score": 1.0,
                    "x0": min(c["x0"] for c in grids[gi]) - 1,
                    "x1": max(c["x1"] for c in grids[gi]) + 1,
                    "top": min(c["top"] for c in grids[gi]) - 1,
                    "bottom": max(c["bottom"] for c in grids[gi]) + 1,
                    "page_number": page_number})
            cur = None
            continue
        cls = _classify(b, page_w, page_h, page_number, in_refs)
        if cls == "reference":
            in_refs = True
        same_col = cur is not None and cls == cur["type"] \
            and b["x0"] < cur["x1"] and cur["x0"] < b["x1"] \
            and 0 <= b["top"] - cur["bottom"] <= 1.5 * med_h
        if same_col and cls in ("text", "reference"):
            cur["x0"] = min(cur["x0"], b["x0"])
            cur["x1"] = max(cur["x1"], b["x1"])
            cur["bottom"] = max(cur["bottom"], b["bottom"])
        else:
            cur = {"type": cls, "score": 1.0,
                   "x0": b["x0"] - 1, "x1": b["x1"] + 1,
                   "top": b["top"] - 1, "bottom": b["bottom"] + 1,
                   "page_number": page_number}
            regions.append(cur)
    return regions


def layouts_rec(page_boxes, page_w, page_h, drop: bool = True):
    """End-to-end rule path of ``PdfParser._layouts_rec``
    (pdf_parser.py:526-533): propose regions per page, then run the
    reference tagging glue.  Returns ``(boxes, page_layout)``."""
    lts = [propose_layouts(bxs, page_w, page_h, pn)
           for pn, bxs in enumerate(page_boxes)]
    return tag_layouts(page_boxes, lts, [page_h] * len(page_boxes),
                       drop=drop)
