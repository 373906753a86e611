"""Knowledge-tag chunk template (content → tag_kwd pairs).

Reference: ``rag/app/tag.py:37-119`` — tab/comma-delimited two-column text:
column 1 is chunk content, column 2 a comma-separated tag list.  Semantics
preserved exactly:

  * txt path (tag.py:62-91): the delimiter is elected by counting which of
    tab/comma splits more lines into exactly 2 fields (tab wins ties);
    malformed lines ACCUMULATE into the next well-formed line's content
    (``content += "\\n" + line``, tag.py:79-83) — every emitted content
    therefore starts with "\\n";
  * csv path (tag.py:94-116): same accumulate rule over csv.reader rows;
  * tag normalization (``beAdoc``, tag.py:27-34):
    ``[t.strip().replace(".", "_") for t in tags.split(",") if t.strip()]``;
  * ``row_num`` = 0-based source line index of the well-formed line
    (``top_int`` analogue, tag.py:33-34).
"""

from __future__ import annotations

import csv


def norm_tags(raw: str) -> list[str]:
    """beAdoc tag_kwd rule (reference tag.py:31)."""
    return [t.strip().replace(".", "_") for t in raw.split(",") if t.strip()]


def chunk_tag_txt(txt: str) -> list[tuple[str, list[str], int]]:
    """txt path → [(content, tag_kwd, row_num)] (reference tag.py:62-91)."""
    lines = txt.split("\n")
    comma = sum(1 for ln in lines if len(ln.split(",")) == 2)
    tab = sum(1 for ln in lines if len(ln.split("\t")) == 2)
    delimiter = "\t" if tab >= comma else ","

    res: list[tuple[str, list[str], int]] = []
    content = ""
    for i, line in enumerate(lines):
        arr = line.split(delimiter)
        if len(arr) != 2:
            content += "\n" + line
        else:
            content += "\n" + arr[0]
            res.append((content, norm_tags(arr[1]), i))
            content = ""
    return res


def chunk_tag_csv(txt: str) -> list[tuple[str, list[str], int]]:
    """csv path → [(content, tag_kwd, row_num)] (reference tag.py:94-116)."""
    lines = txt.split("\n")
    res: list[tuple[str, list[str], int]] = []
    content = ""
    for i, row in enumerate(csv.reader(lines)):
        row = [r.strip() for r in row if r.strip()]
        if len(row) != 2:
            content += "\n" + (lines[i] if i < len(lines) else "")
        else:
            content += "\n" + row[0]
            res.append((content, norm_tags(row[1]), i))
            content = ""
    return res
