"""Table-structure construction: tagged boxes → HTML / linearized rows.

Faithful re-implementation of
``deepdoc/vision/table_structure_recognizer.py:80-587``:

  * ``blockType``      cell-content classifier (Dt/Nu/Ca/En/NE/Sg/Tx/Lx/Nr/Ot)
  * ``is_caption``     caption-box detector
  * ``construct_table``  R/C-tag row & column clustering, singleton
    row/column relocation, header-row election (H tags + Nu-majority),
    span calculation from SP/H extents, then either
    ``__html_table`` (th/td + colspan/rowspan) or ``__desc_table``
    ("header：value; ..." linearization with multi-row header composition).

In the reference these tags come from the TSR ONNX model; here they come
from any upstream tagger (tests use synthetic grids — the construction
logic itself is model-free geometry).
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np

from ..textnorm.rag_tokenizer import get_tokenizer
from .geometry import sort_C_firstly, sort_R_firstly, sort_X_firstly, sort_Y_firstly


def is_caption(bx) -> bool:
    patt = [r"[图表]+[ 0-9:：]{2,}"]
    if any(re.match(p, bx["text"].strip()) for p in patt) \
            or bx.get("layout_type", "").find("caption") >= 0:
        return True
    return False


def block_type(b) -> str:
    patt = [
        ("^(20|19)[0-9]{2}[年/-][0-9]{1,2}[月/-][0-9]{1,2}日*$", "Dt"),
        (r"^(20|19)[0-9]{2}年$", "Dt"),
        (r"^(20|19)[0-9]{2}[年-][0-9]{1,2}月*$", "Dt"),
        ("^[0-9]{1,2}[月-][0-9]{1,2}日*$", "Dt"),
        (r"^第*[一二三四1-4]季度$", "Dt"),
        (r"^(20|19)[0-9]{2}年*[一二三四1-4]季度$", "Dt"),
        (r"^(20|19)[0-9]{2}[ABCDE]$", "Dt"),
        ("^[0-9.,+%/ -]+$", "Nu"),
        (r"^[0-9A-Z/\._~-]+$", "Ca"),
        (r"^[A-Z]*[a-z' -]+$", "En"),
        (r"^[0-9.,+-]+[0-9A-Za-z/$￥%<>（）()' -]+$", "NE"),
        (r"^.{1}$", "Sg"),
    ]
    for p, n in patt:
        if re.search(p, b["text"].strip()):
            return n
    tk = get_tokenizer()
    tks = [t for t in tk.tokenize(b["text"]).split() if len(t) > 1]
    if len(tks) > 3:
        return "Tx" if len(tks) < 12 else "Lx"
    if len(tks) == 1 and tk.tag(tks[0]) == "nr":
        return "Nr"
    return "Ot"


def construct_table(boxes, is_english=False, html=False):
    cap = ""
    i = 0
    while i < len(boxes):
        if is_caption(boxes[i]):
            cap += boxes[i]["text"]
            boxes.pop(i)
            i -= 1
        i += 1
    if not boxes:
        return []
    for b in boxes:
        b["btype"] = block_type(b)
    type_counts = Counter(b["btype"] for b in boxes).items()
    max_type = max(type_counts, key=lambda x: x[1])[0] if type_counts else ""

    # ---- row clustering (R tags / bottom overlap) ----
    rowh = [b["R_bott"] - b["R_top"] for b in boxes if "R" in b]
    rowh = np.min(rowh) if rowh else 0
    boxes = sort_R_firstly(boxes, rowh / 2)
    boxes[0]["rn"] = 0
    rows = [[boxes[0]]]
    btm = boxes[0]["bottom"]
    for b in boxes[1:]:
        b["rn"] = len(rows) - 1
        lst_r = rows[-1]
        if lst_r[-1].get("R", "") != b.get("R", "") \
                or (b["top"] >= btm - 3
                    and lst_r[-1].get("R", "-1") != b.get("R", "-2")):
            btm = b["bottom"]
            b["rn"] += 1
            rows.append([b])
            continue
        btm = (btm + b["bottom"]) / 2.0
        rows[-1].append(b)

    # ---- column clustering (C tags / x overlap) ----
    colwm = [b["C_right"] - b["C_left"] for b in boxes if "C" in b]
    colwm = np.min(colwm) if colwm else 0
    crosspage = len({b["page_number"] for b in boxes}) > 1
    boxes = (sort_X_firstly if crosspage else sort_C_firstly)(boxes, colwm / 2)
    boxes[0]["cn"] = 0
    cols = [[boxes[0]]]
    right = boxes[0]["x1"]
    for b in boxes[1:]:
        b["cn"] = len(cols) - 1
        lst_c = cols[-1]
        if (int(b.get("C", "1")) - int(lst_c[-1].get("C", "1")) == 1
                and b["page_number"] == lst_c[-1]["page_number"]) \
                or (b["x0"] >= right
                    and lst_c[-1].get("C", "-1") != b.get("C", "-2")):
            right = b["x1"]
            b["cn"] += 1
            cols.append([b])
            continue
        right = (right + b["x1"]) / 2.0
        cols[-1].append(b)

    tbl = [[[] for _ in range(len(cols))] for _ in range(len(rows))]
    for b in boxes:
        tbl[b["rn"]][b["cn"]].append(b)

    if len(rows) >= 4:
        _relocate_column_singles(tbl, cols)
    if len(cols) >= 4:
        _relocate_row_singles(tbl, rows)

    # ---- header-row election ----
    hdset = set()
    for i in range(len(tbl)):
        cnt, h = 0, 0
        for arr in tbl[i]:
            if not arr:
                continue
            cnt += 1
            if max_type == "Nu" and arr[0]["btype"] == "Nu":
                continue
            if any(a.get("H") for a in arr) \
                    or (max_type == "Nu" and arr[0]["btype"] != "Nu"):
                h += 1
        if cnt and h / cnt > 0.5:
            hdset.add(i)

    if html:
        return _html_table(cap, hdset, _cal_spans(boxes, rows, cols, tbl, True))
    return _desc_table(cap, hdset, _cal_spans(boxes, rows, cols, tbl, False),
                       is_english)


def _relocate_column_singles(tbl, cols):
    j = 0
    while j < len(tbl[0]):
        e, ii = 0, 0
        for i in range(len(tbl)):
            if tbl[i][j]:
                e += 1
                ii = i
            if e > 1:
                break
        if e > 1:
            j += 1
            continue
        f = (j > 0 and tbl[ii][j - 1] and tbl[ii][j - 1][0].get("text")) or j == 0
        ff = (j + 1 < len(tbl[ii]) and tbl[ii][j + 1]
              and tbl[ii][j + 1][0].get("text")) or j + 1 >= len(tbl[ii])
        if f and ff:
            j += 1
            continue
        bx = tbl[ii][j][0]
        left, right = 100000, 100000
        if j > 0 and not f:
            for i in range(len(tbl)):
                if tbl[i][j - 1]:
                    left = min(left, np.min(
                        [bx["x0"] - a["x1"] for a in tbl[i][j - 1]]))
        if j + 1 < len(tbl[0]) and not ff:
            for i in range(len(tbl)):
                if tbl[i][j + 1]:
                    right = min(right, np.min(
                        [a["x0"] - bx["x1"] for a in tbl[i][j + 1]]))
        if left >= 100000 and right >= 100000:
            j += 1
            continue
        if left < right:
            tgt = j - 1
        else:
            tgt = j + 1
        for jj in range(j if left < right else j + 1, len(tbl[0])):
            for i in range(len(tbl)):
                for a in tbl[i][jj]:
                    a["cn"] -= 1
        if tbl[ii][tgt]:
            tbl[ii][tgt].extend(tbl[ii][j])
        else:
            tbl[ii][tgt] = tbl[ii][j]
        for i in range(len(tbl)):
            tbl[i].pop(j)
        cols.pop(j)


def _relocate_row_singles(tbl, rows):
    i = 0
    while i < len(tbl):
        e, jj = 0, 0
        for j in range(len(tbl[i])):
            if tbl[i][j]:
                e += 1
                jj = j
            if e > 1:
                break
        if e > 1:
            i += 1
            continue
        f = (i > 0 and tbl[i - 1][jj] and tbl[i - 1][jj][0].get("text")) or i == 0
        ff = (i + 1 < len(tbl) and tbl[i + 1][jj]
              and tbl[i + 1][jj][0].get("text")) or i + 1 >= len(tbl)
        if f and ff:
            i += 1
            continue
        bx = tbl[i][jj][0]
        up, down = 100000, 100000
        if i > 0 and not f:
            for j in range(len(tbl[i - 1])):
                if tbl[i - 1][j]:
                    up = min(up, np.min(
                        [bx["top"] - a["bottom"] for a in tbl[i - 1][j]]))
        if i + 1 < len(tbl) and not ff:
            for j in range(len(tbl[i + 1])):
                if tbl[i + 1][j]:
                    down = min(down, np.min(
                        [a["top"] - bx["bottom"] for a in tbl[i + 1][j]]))
        if up >= 100000 and down >= 100000:
            i += 1
            continue
        tgt = i - 1 if up < down else i + 1
        for ii in range(i if up < down else i + 1, len(tbl)):
            for j in range(len(tbl[ii])):
                for a in tbl[ii][j]:
                    a["rn"] -= 1
        if tbl[tgt][jj]:
            tbl[tgt][jj].extend(tbl[i][jj])
        else:
            tbl[tgt][jj] = tbl[i][jj]
        tbl.pop(i)
        rows.pop(i)


def _cal_spans(boxes, rows, cols, tbl, html=True):
    clft = [np.mean([c.get("C_left", c["x0"]) for c in cln]) for cln in cols]
    crgt = [np.mean([c.get("C_right", c["x1"]) for c in cln]) for cln in cols]
    rtop = [np.mean([c.get("R_top", c["top"]) for c in row]) for row in rows]
    rbtm = [np.mean([c.get("R_btm", c["bottom"]) for c in row]) for row in rows]
    for b in boxes:
        if "SP" not in b:
            continue
        b["colspan"] = [b["cn"]]
        b["rowspan"] = [b["rn"]]
        for j in range(len(clft)):
            if j == b["cn"]:
                continue
            if clft[j] + (crgt[j] - clft[j]) / 2 < b["H_left"]:
                continue
            if crgt[j] - (crgt[j] - clft[j]) / 2 > b["H_right"]:
                continue
            b["colspan"].append(j)
        for j in range(len(rtop)):
            if j == b["rn"]:
                continue
            if rtop[j] + (rbtm[j] - rtop[j]) / 2 < b["H_top"]:
                continue
            if rbtm[j] - (rbtm[j] - rtop[j]) / 2 > b["H_bott"]:
                continue
            b["rowspan"].append(j)

    def join(arr):
        return "".join(t["text"] for t in arr) if arr else ""

    for i in range(len(tbl)):
        for j, arr in enumerate(tbl[i]):
            if not arr:
                continue
            if all("rowspan" not in a and "colspan" not in a for a in arr):
                continue
            rowspan, colspan = [], []
            for a in arr:
                if isinstance(a.get("rowspan", 0), list):
                    rowspan.extend(a["rowspan"])
                if isinstance(a.get("colspan", 0), list):
                    colspan.extend(a["colspan"])
            rowspan, colspan = set(rowspan), set(colspan)
            if len(rowspan) < 2 and len(colspan) < 2:
                for a in arr:
                    a.pop("rowspan", None)
                    a.pop("colspan", None)
                continue
            rowspan, colspan = sorted(rowspan), sorted(colspan)
            rowspan = list(range(rowspan[0], rowspan[-1] + 1))
            colspan = list(range(colspan[0], colspan[-1] + 1))
            arr = []
            for r in rowspan:
                for c in colspan:
                    arr_txt = join(arr)
                    if tbl[r][c] and join(tbl[r][c]) != arr_txt:
                        arr.extend(tbl[r][c])
                    tbl[r][c] = None if html else arr
            for a in arr:
                if len(rowspan) > 1:
                    a["rowspan"] = len(rowspan)
                else:
                    a.pop("rowspan", None)
                if len(colspan) > 1:
                    a["colspan"] = len(colspan)
                else:
                    a.pop("colspan", None)
            tbl[rowspan[0]][colspan[0]] = arr
    return tbl


def _html_table(cap, hdset, tbl):
    html = "<table>"
    if cap:
        html += f"<caption>{cap}</caption>"
    for i in range(len(tbl)):
        row = "<tr>"
        txts = []
        for arr in tbl[i]:
            if arr is None:
                continue
            if not arr:
                row += "<td></td>" if i not in hdset else "<th></th>"
                continue
            h = min(np.min([c["bottom"] - c["top"] for c in arr]) / 2, 10)
            txt = " ".join(c["text"] for c in sort_Y_firstly(arr, h))
            txts.append(txt)
            sp = ""
            if arr[0].get("colspan"):
                sp = "colspan={}".format(arr[0]["colspan"])
            if arr[0].get("rowspan"):
                sp += " rowspan={}".format(arr[0]["rowspan"])
            if i in hdset:
                row += f"<th {sp} >" + txt + "</th>"
            else:
                row += f"<td {sp} >" + txt + "</td>"
        if i in hdset:
            if all(t in hdset for t in txts):
                continue
            for t in txts:
                hdset.add(t)
        row = row + "</tr>" if row != "<tr>" else ""
        html += "\n" + row
    html += "\n</table>"
    return html


def _desc_table(cap, hdr_rowno, tbl, is_english):
    clmno = len(tbl[0])
    rowno = len(tbl)
    headers = {}
    lst_hdr = []
    de = "的" if not is_english else " for "
    for r in sorted(hdr_rowno):
        headers[r] = ["" for _ in range(clmno)]
        for i in range(clmno):
            if not tbl[r][i]:
                continue
            headers[r][i] = " ".join(a["text"].strip() for a in tbl[r][i])
        if all(not t for t in headers[r]):
            del headers[r]
            hdr_rowno.remove(r)
            continue
        for j in range(clmno):
            if headers[r][j]:
                continue
            if j >= len(lst_hdr):
                break
            headers[r][j] = lst_hdr[j]
        lst_hdr = headers[r]
    for i in range(rowno):
        if i not in hdr_rowno:
            continue
        for j in range(i + 1, rowno):
            if j not in hdr_rowno:
                break
            for k in range(clmno):
                if not headers[j - 1][k]:
                    continue
                if headers[j][k].find(headers[j - 1][k]) >= 0:
                    continue
                if len(headers[j][k]) > len(headers[j - 1][k]):
                    headers[j][k] += (de if headers[j][k] else "") + headers[j - 1][k]
                else:
                    headers[j][k] = headers[j - 1][k] + \
                        (de if headers[j - 1][k] else "") + headers[j][k]

    row_txt = []
    for i in range(rowno):
        if i in hdr_rowno:
            continue
        rtxt = []

        def append(delimer):
            nonlocal rtxt, row_txt
            rtxt = delimer.join(rtxt)
            if row_txt and len(row_txt[-1]) + len(rtxt) < 64:
                row_txt[-1] += "\n" + rtxt
            else:
                row_txt.append(rtxt)

        r = 0
        if headers:
            _arr = [(i - r, r) for r, _ in headers.items() if r < i]
            if _arr:
                _, r = min(_arr, key=lambda x: x[0])
        if r not in headers and clmno <= 2:
            for j in range(clmno):
                if not tbl[i][j]:
                    continue
                txt = "".join(a["text"].strip() for a in tbl[i][j])
                if txt:
                    rtxt.append(txt)
            if rtxt:
                append("：")
            continue
        for j in range(clmno):
            if not tbl[i][j]:
                continue
            txt = "".join(a["text"].strip() for a in tbl[i][j])
            if not txt:
                continue
            ctt = headers[r][j] if r in headers else ""
            if ctt:
                ctt += "："
            ctt += txt
            if ctt:
                rtxt.append(ctt)
        if rtxt:
            row_txt.append("; ".join(rtxt))
    if cap:
        from_ = " in " if is_english else "来自"
        row_txt = [t + f"\t——{from_}“{cap}”" for t in row_txt]
    return row_txt
