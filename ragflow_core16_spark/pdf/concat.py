"""Model-scored downward concatenation — re-implementation of
``_updown_concat_features`` (``deepdoc/parser/pdf_parser.py:125-180``) and
``_concat_downward`` (``pdf_parser.py:472-579``).

The reference drives the concat decision with an XGBoost binary
(``updown_concat_xgb.model``, threshold 0.5) — an external model asset.
Here the feature extractor is faithful (same 32 features, same order,
including the reference's duplicated comma-tail feature at positions 13/14)
and the scorer is pluggable:

  * if the ``xgboost`` package and a model path (``RAG_UPDOWN_XGB_MODEL``
    env) are both available, the real model scores the features;
  * otherwise a deterministic rule scorer reproduces the dominant learned
    behavior: concat when the upper line has no terminal punctuation, the
    lower line doesn't open a new item (bullet/number/title-case after
    sentence end), and the geometry is tight.

Everything here runs inside the per-document pandas UDF
(SURVEY.md §2.3 — doc-level stage, needs cumulative-Y across pages).
"""

from __future__ import annotations

import re
from copy import deepcopy

from ..textnorm.rag_tokenizer import get_tokenizer
from .geometry import sort_Y_firstly

_PROJ_PATT = [
    r"第[零一二三四五六七八九十百]+章",
    r"第[零一二三四五六七八九十百]+[条节]",
    r"[零一二三四五六七八九十百]+[、是 　]",
    r"[\(（][零一二三四五六七八九十百]+[）\)]",
    r"[\(（][0-9]+[）\)]",
    r"[0-9]+(、|\.[　 ]|）|\.[^0-9./a-zA-Z_%><-]{4,})",
    r"[0-9]+\.[0-9.]+(、|\.[ 　])",
    r"[⚫•➢①② ]",
]


def _height(c):
    return c["bottom"] - c["top"]


def _char_width(c):
    return (c["x1"] - c["x0"]) / max(len(c["text"]), 1)


def _x_dis(a, b):
    return min(abs(a["x1"] - b["x0"]), abs(a["x0"] - b["x1"]),
               abs(a["x0"] + a["x1"] - b["x0"] - b["x1"]) / 2)


def _y_dis(a, b):
    return (b["top"] + b["bottom"] - a["top"] - a["bottom"]) / 2


def match_proj(b) -> bool:
    """Bullet/numbering prefix test (pdf_parser.py:110-122)."""
    return any(re.match(p, b["text"]) for p in _PROJ_PATT)


def updown_concat_features(up, down) -> list:
    """The 32-feature vector of pdf_parser.py:125-180, same order."""
    tok = get_tokenizer()
    w = max(_char_width(up), _char_width(down))
    h = max(_height(up), _height(down))
    y = _y_dis(up, down)
    LEN = 6
    tks_down = tok.tokenize(down["text"][:LEN]).split()
    tks_up = tok.tokenize(up["text"][-LEN:]).split()
    tks_all = up["text"][-LEN:].strip() \
        + (" " if re.match(r"[a-zA-Z0-9]+",
                           up["text"][-1] + down["text"][0]) else "") \
        + down["text"][:LEN].strip()
    tks_all = tok.tokenize(tks_all).split()
    fea = [
        up.get("R", -1) == down.get("R", -1),
        y / max(h, 1e-6),
        down["page_number"] - up["page_number"],
        up["layout_type"] == down["layout_type"],
        up["layout_type"] == "text",
        down["layout_type"] == "text",
        up["layout_type"] == "table",
        down["layout_type"] == "table",
        bool(re.search(r"([。？！；!?;+)）]|[a-z]\.)$", up["text"])),
        bool(re.search(r"[，：‘“、0-9（+-]$", up["text"])),
        bool(re.search(r"(^.?[/,?;:\]，。；：’”？！》】）-])", down["text"])),
        bool(re.match(r"[\(（][^\(\)（）]+[）\)]$", up["text"])),
        bool(re.search(r"[，,][^。.]+$", up["text"])),
        bool(re.search(r"[，,][^。.]+$", up["text"])),  # duplicated in ref
        bool(re.search(r"[\(（][^\)）]+$", up["text"])
             and re.search(r"[\)）]", down["text"])),
        match_proj(down),
        bool(re.match(r"[A-Z]", down["text"])),
        bool(re.match(r"[A-Z]", up["text"][-1])),
        bool(re.match(r"[a-z0-9]", up["text"][-1])),
        bool(re.match(r"[0-9.%,-]+$", down["text"])),
        up["text"].strip()[-2:] == down["text"].strip()[-2:]
        if len(up["text"].strip()) > 1 and len(down["text"].strip()) > 1
        else False,
        up["x0"] > down["x1"],
        abs(_height(up) - _height(down)) /
        max(min(_height(up), _height(down)), 1e-6),
        _x_dis(up, down) / max(w, 0.000001),
        (len(up["text"]) - len(down["text"])) /
        max(len(up["text"]), len(down["text"])),
        len(tks_all) - len(tks_up) - len(tks_down),
        len(tks_down) - len(tks_up),
        tks_down[-1] == tks_up[-1] if tks_down and tks_up else False,
        max(down["in_row"], up["in_row"]),
        abs(down["in_row"] - up["in_row"]),
        len(tks_down) == 1 and tok.tag(tks_down[0]).find("n") >= 0,
        len(tks_up) == 1 and tok.tag(tks_up[0]).find("n") >= 0,
    ]
    return fea


def rule_scorer(fea: list) -> float:
    """Deterministic fallback for the XGB model: probability-like score in
    [0,1], >0.5 → concat.  Encodes the dominant learned signals: sentence
    already terminated (fea[8]) or a new item starting (fea[15]/[16] after
    termination) vote against; dangling commas/conjunctions (fea[9],
    fea[12]), tight vertical gap (fea[1]) and same layout (fea[3]) vote
    for."""
    score = 0.5
    if fea[8]:                      # up ends with terminal punctuation
        score -= 0.35
    else:                           # line stops mid-sentence → continues
        score += 0.15
    if fea[9] or fea[12]:           # up ends dangling (comma/colon/open)
        score += 0.30
    if fea[10]:                     # down starts with closing punctuation
        score += 0.25
    if fea[15]:                     # down starts a new bullet/number item
        score -= 0.35
    if fea[16] and fea[8]:          # Title-case start after sentence end
        score -= 0.15
    if not fea[3]:                  # layout type mismatch
        score -= 0.20
    if fea[1] > 3:                  # vertical gap > 3 line heights
        score -= 0.25
    if fea[19]:                     # pure-number down line (page no etc.)
        score -= 0.20
    if fea[21]:                     # down is left of up (column break)
        score -= 0.15
    return max(0.0, min(1.0, score))


_XGB_CACHE: dict = {}


def get_scorer():
    """→ callable(list[fea])->float: the XGB model when available
    (RAG_UPDOWN_XGB_MODEL env + xgboost importable), else rule_scorer."""
    import os
    if "scorer" in _XGB_CACHE:
        return _XGB_CACHE["scorer"]
    path = os.environ.get("RAG_UPDOWN_XGB_MODEL")
    scorer = rule_scorer
    if path and os.path.exists(path):
        try:
            import xgboost as xgb
            mdl = xgb.Booster()
            mdl.load_model(path)

            def scorer(fea, _m=mdl, _x=xgb):  # noqa: E731
                return float(_m.predict(_x.DMatrix([fea]))[0])
        except Exception:
            pass
    _XGB_CACHE["scorer"] = scorer
    return scorer


def tag_in_row(boxes, mean_height) -> None:
    """Annotate each box with ``in_row`` — count of boxes within ±12
    neighbors on the same visual row (pdf_parser.py:474-487)."""
    for i in range(len(boxes)):
        mh = mean_height[boxes[i]["page_number"] - 1]
        boxes[i]["in_row"] = 0
        j = max(0, i - 12)
        while j < min(i + 12, len(boxes)):
            if j == i:
                j += 1
                continue
            ydis = _y_dis(boxes[i], boxes[j]) / max(mh, 1e-6)
            if abs(ydis) < 1:
                boxes[i]["in_row"] += 1
            elif ydis > 0:
                break
            j += 1


def concat_downward(boxes, mean_height, mean_width, scorer=None,
                    concat_between_pages: bool = True) -> list:
    """DFS down-concat (pdf_parser.py:472-579): walk down up to 12
    candidates; text-layout fast path when same layoutno within 5; otherwise
    score the 32 features and concat when score > 0.5.  Returns merged
    boxes, Y-sorted."""
    scorer = scorer or get_scorer()
    tag_in_row(boxes, mean_height)
    boxes = deepcopy(boxes)
    blocks = []
    while boxes:
        chunks = []

        def dfs(up, dp):
            chunks.append(up)
            i = dp
            while i < min(dp + 12, len(boxes)):
                ydis = _y_dis(up, boxes[i])
                smpg = up["page_number"] == boxes[i]["page_number"]
                mh = mean_height[up["page_number"] - 1]
                mw = mean_width[up["page_number"] - 1]
                if smpg and ydis > mh * 4:
                    break
                if not smpg and ydis > mh * 16:
                    break
                down = boxes[i]
                if not concat_between_pages \
                        and down["page_number"] > up["page_number"]:
                    break
                if up.get("R", "") != down.get("R", "") \
                        and up["text"][-1] != "，":
                    i += 1
                    continue
                if re.match(r"[0-9]{2,3}/[0-9]{3}$", up["text"]) \
                        or re.match(r"[0-9]{2,3}/[0-9]{3}$", down["text"]) \
                        or not down["text"].strip():
                    i += 1
                    continue
                if not down["text"].strip() or not up["text"].strip():
                    i += 1
                    continue
                if up["x1"] < down["x0"] - 10 * mw \
                        or up["x0"] > down["x1"] + 10 * mw:
                    i += 1
                    continue
                if i - dp < 5 and up.get("layout_type") == "text":
                    if up.get("layoutno", "1") == down.get("layoutno", "2"):
                        dfs(down, i + 1)
                        boxes.pop(i)
                        return
                    i += 1
                    continue
                fea = updown_concat_features(up, down)
                if scorer(fea) <= 0.5:
                    i += 1
                    continue
                dfs(down, i + 1)
                boxes.pop(i)
                return

        dfs(boxes[0], 1)
        boxes.pop(0)
        if chunks:
            blocks.append(chunks)

    out = []
    for b in blocks:
        if len(b) == 1:
            out.append(b[0])
            continue
        t = b[0]
        for c in b[1:]:
            t["text"] = t["text"].strip()
            c["text"] = c["text"].strip()
            if not c["text"]:
                continue
            if t["text"] and re.match(r"[0-9\.a-zA-Z]+$",
                                      t["text"][-1] + c["text"][-1]):
                t["text"] += " "
            t["text"] += c["text"]
            t["x0"] = min(t["x0"], c["x0"])
            t["x1"] = max(t["x1"], c["x1"])
            t["page_number"] = min(t["page_number"], c["page_number"])
            t["bottom"] = c["bottom"]
            if not t["layout_type"] and c["layout_type"]:
                t["layout_type"] = c["layout_type"]
        out.append(t)
    return sort_Y_firstly(out, 0)
